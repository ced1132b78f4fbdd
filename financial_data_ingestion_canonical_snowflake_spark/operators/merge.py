"""Merge-upsert operator (SURVEY.md §2.10, M1-M3).

Reimplements Snowflake ``MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT`` (reference sql/05_merge_canonical.sql:6-53,
sql/06_anomaly_detection.sql:30-50) without Delta Lake: a full-outer join
picks source values for matched/new keys and keeps ``preserve`` columns
(e.g. ``created_ts``) from the target on matched rows.

Scale notes (100 TB posture):
- The join shuffles both sides on the merge keys — exactly what a real MERGE
  does. If the target table is bucketed by the merge keys on disk, the scan
  side avoids its shuffle entirely; callers writing canonical tables should
  bucket by the merge key.
- The source is usually a small incremental batch: AQE converts the join to
  broadcast at runtime when it fits, so we don't hard-code a hint.
- Snowflake raises on nondeterministic merges (duplicate source keys); our
  operator dedupes the source first when ``dedupe_order`` is given (latest
  wins), matching the M2 semantics note in SURVEY.md.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_T_PRESENT = "__merge_t_present"
_S_PRESENT = "__merge_s_present"


def dedupe_source(df: DataFrame, keys: Sequence[str], order_cols: Sequence) -> DataFrame:
    """Keep one row per key, ordered by ``order_cols`` (first row wins)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    preserve: Sequence[str] = (),
    dedupe_order: Sequence | None = None,
    set_on_update: dict | None = None,
    set_on_insert: dict | None = None,
) -> DataFrame:
    """MERGE emulation: returns the post-merge table as a DataFrame.

    - matched rows  -> source values, except ``preserve`` columns kept from
      target (reference keeps ``created_ts`` on update,
      sql/05_merge_canonical.sql:22-29)
    - unmatched target rows -> unchanged
    - unmatched source rows -> inserted
    - ``set_on_update`` / ``set_on_insert``: column->Column overrides applied
      to matched / inserted rows (e.g. ``updated_ts = current_timestamp()``).

    NULL key values match null-safely (reference M3 uses
    ``COALESCE(line_number, -1)`` to the same effect,
    sql/06_anomaly_detection.sql:36-39).
    """
    keys = list(keys)
    out_cols = list(target.columns)
    assert set(out_cols) == set(source.columns), (
        f"merge_upsert requires aligned schemas; target={out_cols} source={source.columns}"
    )
    if dedupe_order is not None:
        source = dedupe_source(source, keys, dedupe_order)

    t = target.select(
        F.lit(True).alias(_T_PRESENT), *[F.col(c).alias(f"__t_{c}") for c in out_cols]
    )
    s = source.select(
        F.lit(True).alias(_S_PRESENT), *[F.col(c).alias(f"__s_{c}") for c in out_cols]
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__t_{k}").eqNullSafe(F.col(f"__s_{k}")) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")

    matched = F.col(_T_PRESENT).isNotNull() & F.col(_S_PRESENT).isNotNull()
    inserted = F.col(_T_PRESENT).isNull()
    set_on_update = set_on_update or {}
    set_on_insert = set_on_insert or {}

    projections = []
    for c in out_cols:
        tc, sc = F.col(f"__t_{c}"), F.col(f"__s_{c}")
        if c in preserve:
            base = F.when(matched, tc).when(inserted, sc).otherwise(tc)
        else:
            base = F.when(matched | inserted, sc).otherwise(tc)
        if c in set_on_update:
            base = F.when(matched, set_on_update[c]).otherwise(base)
        if c in set_on_insert:
            base = F.when(inserted, set_on_insert[c]).otherwise(base)
        projections.append(base.alias(c))
    return joined.select(*projections)
