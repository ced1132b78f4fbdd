"""Time-series gap filling (forward fill onto a regular grid).

Downsampling an irregular event stream to a regular grid with
last-observation-carried-forward is the standard feature-store /
time-series-training preparation step. The naive shape — generate the full
(key × grid) frame and join observations onto it — shuffles the whole grid.
This implementation never builds the grid:

1. bucket observations to the grid step and keep the last observation per
   (key, bucket) — a map-side-combined groupBy, so the first exchange
   carries one row per observed bucket, not one per event;
2. per key, each observation looks at the NEXT observed bucket (``lead``)
   and explodes ``sequence(bucket, next_bucket - step)``, carrying its
   value forward. The window's key exchange moves only the bucket
   summaries from step 1 — already tiny.

Fan-out is proportional to the OUTPUT (one row per filled grid point) and
there is no grid join — the layout a 1000-executor cluster wants.
Trailing edge: each key's series ends at its last observation (no
extrapolation beyond the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    *,
    step_seconds: int,
) -> DataFrame:
    """Forward-fill ``value_col`` onto a ``step_seconds`` grid per key.

    Returns ``(key, bucket_us, value, is_observed)`` — one row per grid
    point from each key's first observed bucket through its last;
    ``is_observed`` marks buckets that contained a real observation (the
    run head), filled rows carry the value forward. The last observation
    within a bucket wins, ordered by (``ts_col``, ``order_col``) — the
    deterministic survivorship tiebreak (SURVEY.md §7.4). Two exchanges:
    the map-side-combined (key, bucket) groupBy, then a key exchange over
    the (small) bucket summaries for the lead() window.
    """
    step_us = int(step_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    # pmod, not %: % truncates toward zero, which would round pre-1970
    # timestamps UP to the bucket above them; pmod gives floor semantics
    # for any sign.
    bucket = (us - F.pmod(us, F.lit(step_us))).alias("bucket_us")
    obs = (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            bucket,
            F.struct(us.alias("u"), F.col(order_col).alias("o"),
                     F.col(value_col).alias("v")).alias("s"),
        )
        .groupBy("key", "bucket_us")
        .agg(F.max("s").alias("s"))
        .select("key", "bucket_us", F.col("s.v").alias("value"))
    )
    w = Window.partitionBy("key").orderBy("bucket_us")
    runs = obs.withColumn("next_bucket", F.lead("bucket_us").over(w))
    fill_end = F.coalesce(
        F.col("next_bucket") - F.lit(step_us), F.col("bucket_us")
    )
    return runs.select(
        "key",
        "value",
        F.col("bucket_us").alias("obs_bucket"),
        F.explode(
            F.sequence(F.col("bucket_us"), fill_end, F.lit(step_us))
        ).alias("bucket_us"),
    ).select(
        "key",
        "bucket_us",
        "value",
        (F.col("bucket_us") == F.col("obs_bucket")).alias("is_observed"),
    )
