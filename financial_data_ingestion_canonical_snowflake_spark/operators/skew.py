"""Skew-mitigation join operators.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the manual
fallback for the cases AQE can't fix — e.g. a single hot key whose rows all
carry the same join value (AQE can split the probe side, but a broadcast-less
join of one hot key still funnels build-side rows through few tasks), or
deterministic co-partitioning needs across engines.

``salted_join``: the skewed (large) side gets a random-ish salt in
[0, salt_factor); the small side is replicated salt_factor times via an
explode — turning one hot shuffle partition into ``salt_factor`` even ones.
Replication multiplies the small side's shuffle volume, so salt_factor trades
hot-partition latency against total shuffle bytes; 8-32 is the useful range
at 100 TB.

The salt is ``pmod(hash(monotonically_increasing_id()), k)`` — effectively
row-uniform, no RNG state, and never NULL, so inner/left join results are
IDENTICAL to the unsalted join (proved by the parity query
``skew_salted_join`` against a plain-join oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side replicated.

    Supports ``inner`` and ``left`` (skewed side preserved) — the join types
    where per-key fan-out of the small side is safe. Result columns match
    ``skewed.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    s = skewed.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_factor))
    )
    r = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return s.join(r, keys + [_SALT], how).drop(_SALT)


def key_skew_report(
    df: DataFrame, keys: Sequence[str], top_n: int = 10
) -> DataFrame:
    """The skew diagnosis that precedes choosing a mitigation: the top-N
    heaviest key groups with their row counts, each key's share of the
    table in parts-per-million (integer-exact), and the running cumulative
    share — read before reaching for ``salted_join`` / AQE knobs / bucket
    caps (a top key at 30% of the table says salt; a long flat tail says
    leave AQE to it).

    One groupBy on the keys (map-side combined) and a TakeOrdered top-N —
    the report costs what one aggregation over the table costs at any
    scale. Returns ``(rank, <keys...>, key_rows, total_rows, share_ppm,
    cum_share_ppm)`` ordered by weight; NULL key values group like any
    other value (they are often exactly the hot key)."""
    from pyspark.sql.window import Window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("key_rows"))
    total = counts.agg(F.sum("key_rows").cast("long").alias("total_rows"))
    top = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.desc("key_rows"), *[F.asc_nulls_first(k) for k in keys])
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("key_rows"), *[F.asc_nulls_first(k) for k in keys])
    share = (F.col("key_rows") * F.lit(1_000_000)) / F.col("total_rows")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("share_ppm", F.floor(share).cast("long"))
        .withColumn(
            "cum_share_ppm",
            F.floor(
                (F.sum("key_rows").over(w) * F.lit(1_000_000)) / F.col("total_rows")
            ).cast("long"),
        )
        .select("rank", *keys, "key_rows", "total_rows", "share_ppm", "cum_share_ppm")
    )
