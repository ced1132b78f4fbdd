"""Robust per-group outlier detection: exact positional quartiles + the
Tukey 1.5-IQR fence — the numeric data-quality staple (flag suspicious
amounts per segment without assuming a distribution).

Quartiles use POSITIONAL semantics (percentile_disc style): q is the
value at row ``ceil(q * n)`` of the group ordered by ``(value, id)`` —
an actual data value, deterministic under ties, and reproducible in any
engine without interpolation-convention hazards. The fence arithmetic is
a short IEEE chain over those exact values, so the whole report is
engine-exact.

Shape: one shuffle on the group key (the ranking window), then the fence
counts rejoin the ranked rows WITHOUT a second shuffle — both sides of
the self-join are partitioned by the group key already. At 100 TB a
single-pass sketch (operators/sketches.py hist_quantiles) is the cheap
approximate alternative; this operator is the exact tier for
dimension-bounded groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def iqr_outlier_report(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Per group: ``(group_cols..., n, p25, median, p75, lo_fence,
    hi_fence, n_low, n_high)`` with positional quartiles and Tukey
    ``k``-IQR fences. NULL values are excluded up front."""
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        *group_cols, v.alias("__v"), F.col(id_col).alias("__id")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("__v"), F.asc("__id"))
    wp = Window.partitionBy(*group_cols)
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wp)
    )

    def at(q: float) -> F.Column:
        pos = F.ceil(F.lit(q) * F.col("__n").cast("double")).cast("long")
        return F.max(F.when(F.col("__rn") == pos, F.col("__v")))

    qs = ranked.groupBy(*group_cols).agg(
        F.max("__n").cast("long").alias("n"),
        at(0.25).alias("p25"),
        at(0.5).alias("median"),
        at(0.75).alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    fenced = qs.select(
        *group_cols, "n", "p25", "median", "p75",
        (F.col("p25") - (F.lit(k) * iqr)).alias("lo_fence"),
        (F.col("p75") + (F.lit(k) * iqr)).alias("hi_fence"),
    )
    counts = (
        base.join(fenced.select(*group_cols, "lo_fence", "hi_fence"), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.sum((F.col("__v") < F.col("lo_fence")).cast("long"))
            .cast("long")
            .alias("n_low"),
            F.sum((F.col("__v") > F.col("hi_fence")).cast("long"))
            .cast("long")
            .alias("n_high"),
        )
    )
    return fenced.join(counts, group_cols).select(
        *group_cols, "n", "p25", "median", "p75",
        "lo_fence", "hi_fence", "n_low", "n_high",
    )
