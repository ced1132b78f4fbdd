"""Z-order clustering + file-skipping index (operators/zorder.py).

Covers the PHYSICAL path the parity query can't pin (range-partitioned
write, footer-stats harvest, actual file pruning): clustered layouts must
skip most files for a 2-D box AND return exactly the rows a full scan
would. Curve-math unit checks pin the bit interleave against hand
values. Cross-engine value parity of the layout math lives in
plans/parity_layout.py (ns_zorder_layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.zorder import (
    file_stats,
    interleave_bits,
    prune_files,
    pruned_read,
    scale_to_bits,
    zorder_write,
)


def test_interleave_known_values(spark):
    # x=0b101 (5), y=0b011 (3), 3 bits: z bits (b*2+i) ->
    # b0: x0=1 -> 1, y0=1 -> 2; b1: x1=0, y1=1 -> 8; b2: x2=1 -> 16
    df = spark.range(1).select(
        interleave_bits([F.lit(5).cast("long"), F.lit(3).cast("long")], 3).alias("z")
    )
    assert df.first().z == 1 + 2 + 8 + 16


def test_interleave_monotone_locality(spark):
    # equal points interleave equal; the max corner takes the max z
    df = spark.range(1).select(
        interleave_bits([F.lit(7).cast("long"), F.lit(7).cast("long")], 3).alias("z")
    )
    assert df.first().z == 63  # all 6 bits set


def test_interleave_overflow_guard():
    with pytest.raises(ValueError, match="overflows"):
        interleave_bits([F.lit(1), F.lit(1), F.lit(1), F.lit(1)], 16)


def test_scale_clamps_and_degenerate(spark):
    row = (
        spark.range(1)
        .select(
            scale_to_bits(F.lit(-5.0), F.lit(0.0), F.lit(10.0), 8).alias("below"),
            scale_to_bits(F.lit(99.0), F.lit(0.0), F.lit(10.0), 8).alias("above"),
            scale_to_bits(F.lit(10.0), F.lit(0.0), F.lit(10.0), 8).alias("edge"),
            scale_to_bits(F.lit(7.0), F.lit(7.0), F.lit(7.0), 8).alias("degen"),
        )
        .first()
    )
    assert row.below == 0 and row.above == 255 and row.edge == 255 and row.degen == 0


@pytest.fixture(scope="module")
def clustered(spark, sf_oracle, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "customer_z")
    c = spark.read.parquet(f"{sf_oracle}/customer.parquet")
    zorder_write(c, path, ["c_acctbal", "c_nationkey"], n_files=16)
    return path


def test_zorder_skips_most_files_and_stays_exact(spark, sf_oracle, clustered):
    stats = file_stats(spark, clustered, ["c_acctbal", "c_nationkey"]).cache()
    n_files = stats.count()
    assert n_files >= 8  # the range shuffle actually fanned out
    box = {"c_acctbal": (1000.0, 3000.0), "c_nationkey": (5.0, 9.0)}
    kept = prune_files(stats, box)
    # a 2-D box covering ~20% x ~20% of the domain must not touch most
    # files — this is the whole point of the curve (a 1-D sort on acctbal
    # would keep ~all files for the nationkey side of the predicate)
    assert 0 < len(kept) < n_files * 0.7
    got = pruned_read(spark, stats, box)
    full = spark.read.parquet(f"{sf_oracle}/customer.parquet").filter(
        F.col("c_acctbal").between(1000.0, 3000.0)
        & F.col("c_nationkey").between(5, 9)
    )
    assert sorted(r.c_custkey for r in got.collect()) == sorted(
        r.c_custkey for r in full.collect()
    )
    stats.unpersist()


def test_zorder_dropped_files_provably_empty(spark, clustered):
    """Superset guarantee, checked from the other side: files the index
    drops contain ZERO rows matching the box."""
    stats = file_stats(spark, clustered, ["c_acctbal", "c_nationkey"])
    box = {"c_acctbal": (1000.0, 3000.0), "c_nationkey": (5.0, 9.0)}
    kept = set(prune_files(stats, box))
    dropped = [r.file for r in stats.select("file").collect() if r.file not in kept]
    assert dropped  # the previous test guarantees some are dropped
    hits = (
        spark.read.parquet(*dropped)
        .filter(
            F.col("c_acctbal").between(1000.0, 3000.0)
            & F.col("c_nationkey").between(5, 9)
        )
        .count()
    )
    assert hits == 0
