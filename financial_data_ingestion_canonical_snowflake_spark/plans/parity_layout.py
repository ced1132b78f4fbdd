"""Data-layout parity queries (operators/zorder.py).

The Z-curve math (min/max normalize -> bit interleave) is pure IEEE +
integer arithmetic, so the DuckDB oracle rebuilds IDENTICAL curve values
and the whole layout plan — file assignment, per-file min/max envelopes,
and the skipping decision for a query box — is value-verified cross-engine.

The production write path (``zorder_write``) range-partitions the curve
value with sampled boundaries (scalable, but boundary sampling is
engine-private); this query pins the layout DETERMINISTICALLY instead via
an explicit rank -> file assignment, which verifies every piece of math
the write path uses. The physical write + actual file skipping is
exercised in tests/test_zorder.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import zorder as zo
from .registry import parity, table

_BITS = 8
_N_FILES = 16
#: query box: acctbal in [1000, 3000] AND nationkey in [5, 9]
_BOX_A = (1000.0, 3000.0)
_BOX_N = (5, 9)


def _interleave_sql(names: list[str], bits: int) -> str:
    """SQL twin of operators.zorder.interleave_bits (same term order)."""
    n = len(names)
    terms = []
    for b in range(bits):
        for i, s in enumerate(names):
            terms.append(f"(({s} >> {b}) & 1) * {1 << (b * n + i)}")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
    WITH b AS (
        SELECT CAST(MIN(c_acctbal) AS DOUBLE) AS lo_a,
               CAST(MAX(c_acctbal) AS DOUBLE) AS hi_a,
               CAST(MIN(c_nationkey) AS DOUBLE) AS lo_n,
               CAST(MAX(c_nationkey) AS DOUBLE) AS hi_n
        FROM customer
    ),
    s AS (
        SELECT c_custkey, c_acctbal, c_nationkey,
               CASE WHEN (hi_a - lo_a) = 0 THEN 0
                    ELSE LEAST(255, GREATEST(0,
                         CAST(floor(((CAST(c_acctbal AS DOUBLE) - lo_a)
                                     / (hi_a - lo_a)) * 256.0) AS BIGINT))) END
                   AS sa,
               CASE WHEN (hi_n - lo_n) = 0 THEN 0
                    ELSE LEAST(255, GREATEST(0,
                         CAST(floor(((CAST(c_nationkey AS DOUBLE) - lo_n)
                                     / (hi_n - lo_n)) * 256.0) AS BIGINT))) END
                   AS sn
        FROM customer, b
    ),
    z AS (
        SELECT c_custkey, c_acctbal, c_nationkey,
               {_interleave_sql(["sa", "sn"], _BITS)} AS zv
        FROM s
    ),
    r AS (
        SELECT *, row_number() OVER (ORDER BY zv, c_custkey) - 1 AS rn,
               COUNT(*) OVER () AS total
        FROM z
    ),
    f AS (SELECT *, (rn * {_N_FILES}) // total AS file_id FROM r),
    agg AS (
        SELECT CAST(file_id AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(c_acctbal) AS DOUBLE) AS min_acctbal,
               CAST(MAX(c_acctbal) AS DOUBLE) AS max_acctbal,
               CAST(MIN(c_nationkey) AS BIGINT) AS min_nation,
               CAST(MAX(c_nationkey) AS BIGINT) AS max_nation
        FROM f GROUP BY 1
    )
    SELECT *,
           CAST(CASE WHEN max_acctbal >= {_BOX_A[0]} AND min_acctbal <= {_BOX_A[1]}
                      AND max_nation >= {_BOX_N[0]} AND min_nation <= {_BOX_N[1]}
                     THEN 1 ELSE 0 END AS INT) AS kept
    FROM agg
"""


@parity("ns_zorder_layout", oracle=_ZORDER_ORACLE)
def ns_zorder_layout(spark, sf_dir):
    """Deterministic Z-order layout plan over customer (c_acctbal x
    c_nationkey): curve values, rank -> 16-file assignment, per-file
    min/max envelopes, and the skipping decision for a 2-D query box.
    The oracle rebuilds identical curve values bit-for-bit, so the layout
    math behind ``zorder_write`` + ``prune_files`` is value-verified —
    the explicit form of Delta OPTIMIZE ZORDER + file-stats pruning, the
    layout primitive that keeps multi-predicate scans sublinear at
    100 TB."""
    c = table(spark, sf_dir, "customer")
    b = c.agg(
        F.min("c_acctbal").cast("double"),
        F.max("c_acctbal").cast("double"),
        F.min("c_nationkey").cast("double"),
        F.max("c_nationkey").cast("double"),
    ).first()
    sa = zo.scale_to_bits(F.col("c_acctbal"), F.lit(b[0]), F.lit(b[1]), _BITS)
    sn = zo.scale_to_bits(F.col("c_nationkey"), F.lit(b[2]), F.lit(b[3]), _BITS)
    zv = zo.interleave_bits([sa, sn], _BITS)
    ranked = (
        c.select("c_custkey", "c_acctbal", "c_nationkey", zv.alias("zv"))
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy("zv", "c_custkey")) - F.lit(1),
        )
        .withColumn("total", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn(
            "file_id",
            F.expr(f"CAST((CAST(rn AS BIGINT) * {_N_FILES}) DIV total AS BIGINT)"),
        )
    )
    agg = ranked.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("c_acctbal").cast("double").alias("min_acctbal"),
        F.max("c_acctbal").cast("double").alias("max_acctbal"),
        F.min("c_nationkey").cast("long").alias("min_nation"),
        F.max("c_nationkey").cast("long").alias("max_nation"),
    )
    kept = (
        (F.col("max_acctbal") >= _BOX_A[0])
        & (F.col("min_acctbal") <= _BOX_A[1])
        & (F.col("max_nation") >= _BOX_N[0])
        & (F.col("min_nation") <= _BOX_N[1])
    )
    return agg.withColumn("kept", kept.cast("int"))
