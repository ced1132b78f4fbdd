"""Survivorship dedupe operator (SURVEY.md §2.5, W1/W2).

Reference sql/03_transform_headers.sql:76-82:
    ROW_NUMBER() OVER (PARTITION BY client_id, source_txn_id
                       ORDER BY ingest_ts DESC)        AS rn
    COUNT(*)     OVER (PARTITION BY client_id, source_txn_id) AS dup_cnt

Both windows share one partitioning, so Catalyst plans a single shuffle for
the pair — at 100 TB this matters: dedupe costs exactly one exchange on the
business key. Ties on the order column are nondeterministic in both engines;
callers pass a deterministic ``tiebreaker`` (payload_hash in the pipeline)
per SURVEY.md §7.4-4.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_duplicates(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rn_col: str = "rn",
    dup_col: str = "dup_cnt",
) -> DataFrame:
    """Attach survivorship rank + duplicate count over the business key."""
    part = Window.partitionBy(*keys)
    return df.withColumn(rn_col, F.row_number().over(part.orderBy(*order_by))).withColumn(
        dup_col, F.count(F.lit(1)).over(part)
    )


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    keep_dup_count: bool = False,
) -> DataFrame:
    """Survivor per key: latest by ``order_by`` wins (``WHERE rn = 1``,
    reference sql/05_merge_canonical.sql:13)."""
    ranked = rank_duplicates(df, keys, order_by)
    out = ranked.filter(F.col("rn") == 1).drop("rn")
    if not keep_dup_count:
        out = out.drop("dup_cnt")
    return out
