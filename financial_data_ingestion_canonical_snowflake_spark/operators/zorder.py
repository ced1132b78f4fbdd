"""Z-order clustering + min/max file-skipping index (multi-column pruning).

Hive partitioning (ParquetTable) prunes on ONE dimension; queries that
filter on several columns at once (client AND amount band, time AND user)
still scan every file of the matching partition. The standard lakehouse
answer — Delta/Iceberg ``OPTIMIZE ZORDER BY`` — maps each row onto a
space-filling curve over the filter columns, range-partitions the curve
value, and writes files whose per-column min/max envelopes are TIGHT in
every dimension at once; a stats index over those envelopes then skips
files whose box can't intersect the query box. The reference has no
analog (its RAW layer is append-only; `sql/01_raw_ingestion.sql`), but at
100 TB this layout step is what keeps multi-predicate scans from reading
the world.

Implementation is pure DataFrame math — no UDFs, no driver state beyond
one O(n_cols) min/max row and the O(n_files) stats index:

- **curve value**: each column min/max-normalizes to a ``bits``-bit
  integer (IEEE double ops — bit-identical across engines), and the bits
  interleave into one BIGINT via shift/mask/multiply-by-2^k terms, all
  integer-exact and reproducible in ANSI SQL (the DuckDB oracle rebuilds
  identical curve values; see plans/parity_layout.py).
- **write path**: ``repartitionByRange`` on the curve value (sampled range
  boundaries — one extra shuffle, the same cost class as the write
  itself) + ``sortWithinPartitions`` → one tightly-boxed file per range.
- **skipping index**: per-file min/max/count harvested from the parquet
  footer scan (``_metadata.file_path`` group-agg) — the explicit form of
  Delta's file-stats table. Pruning intersects the query box with each
  file box; the file list is collected (O(n_files), the same
  driver-small class as a runtime filter) and fed back to the reader.

Skipping is a SUPERSET guarantee (a kept file may still contain no
matching row; a dropped file provably cannot) — exactness comes from the
normal predicate applied after the pruned scan, mirroring how Bloom
pre-filtering composes with the real join (operators/sketches.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: default per-column resolution; n_cols * bits must stay < 63 (BIGINT)
DEFAULT_BITS = 16


def scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-normalize ``col`` to an integer in [0, 2^bits).

    Canonical op order ``floor(((v - lo) / (hi - lo)) * m)`` in DOUBLE —
    IEEE division/multiply/floor are bit-identical across engines, so the
    oracle reproduces the exact integer. Degenerate domains (hi == lo) and
    out-of-range values clamp instead of overflowing.
    """
    m = 1 << bits
    v = col.cast("double")
    span = hi.cast("double") - lo.cast("double")
    scaled = F.floor(((v - lo.cast("double")) / span) * F.lit(float(m)))
    clamped = F.least(F.lit(m - 1), F.greatest(F.lit(0), scaled))
    return F.when(span == 0.0, F.lit(0)).otherwise(clamped).cast("long")


def interleave_bits(scaled: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits``-bit integers into one Z-curve BIGINT.

    z = sum over bit b, column i of ((s_i >> b) & 1) * 2^(b*n + i) —
    a static expression tree of shift/mask/multiply terms (JVM-evaluated,
    whole-stage-codegen friendly; no UDF, no loop at runtime).
    """
    n = len(scaled)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows BIGINT")
    terms = []
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            terms.append(bit * F.lit(1 << (b * n + i)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zorder_value(
    df: DataFrame, cols: Sequence[str], bits: int = DEFAULT_BITS
) -> Column:
    """Z-curve value over ``cols`` using the frame's own min/max bounds.

    The bounds arrive via scalar subqueries computed from ``df`` itself
    (one tiny agg broadcast by Catalyst — no driver collect, no second
    pass over the raw data at plan-build time).
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    )
    scaled = []
    for c in cols:
        lo = _scalar(bounds, f"__lo_{c}")
        hi = _scalar(bounds, f"__hi_{c}")
        scaled.append(scale_to_bits(F.col(c), lo, hi, bits))
    return interleave_bits(scaled, bits)


def _scalar(agg_df: DataFrame, col: str) -> Column:
    """A 1-row aggregate as a scalar column (cross-join-free literal-ish
    plan input): collect is O(1) and happens once at plan build."""
    row = agg_df.select(col).first()
    return F.lit(float(row[0]) if row[0] is not None else 0.0)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Cluster ``df`` by the Z-curve over ``cols`` into ``n_files`` files.

    One range shuffle on the curve value (sampled boundaries — the scalable
    total-order primitive), an in-partition sort, and a plain parquet
    write: every output file covers a contiguous curve segment, so its
    min/max box is tight in ALL ``cols`` at once.
    """
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max/count skipping index — Delta file-stats, explicit.

    One aggregation over the table keyed by ``_metadata.file_path``; at
    100 TB this runs once per layout (not per query) and lands in a stats
    table of O(n_files) rows.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).cast("long").alias("rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(
    stats: DataFrame, box: Mapping[str, tuple[float, float]]
) -> list[str]:
    """Files whose per-column envelopes intersect the query ``box``
    (col -> (lo, hi) inclusive). Collect is O(n_files) — the driver-small
    'ship the file list to the scan' step every skipping index performs."""
    keep = F.lit(True)
    for c, (lo, hi) in box.items():
        keep = keep & (F.col(f"max_{c}") >= F.lit(lo)) & (F.col(f"min_{c}") <= F.lit(hi))
    return [r.file for r in stats.filter(keep).select("file").collect()]


def pruned_read(
    spark: SparkSession,
    stats: DataFrame,
    box: Mapping[str, tuple[float, float]],
) -> DataFrame:
    """Read ONLY the files the skipping index keeps for ``box``, then apply
    the exact box predicate (kept files are a superset; the predicate makes
    the result exact)."""
    files = prune_files(stats, box)
    if not files:
        raise ValueError("no files intersect the box (empty result; read nothing)")
    df = spark.read.parquet(*files)
    for c, (lo, hi) in box.items():
        df = df.filter((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
    return df
