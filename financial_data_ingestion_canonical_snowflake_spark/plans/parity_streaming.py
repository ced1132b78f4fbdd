"""Live Structured-Streaming parity query.

Unlike ``stream_tumbling_window_agg`` (the batch twin of the streaming plan),
this query drives the REAL streaming path: file-source readStream ->
watermarked tumbling window -> availableNow drain into a memory sink — and
still hash-matches the DuckDB oracle, proving streaming/batch agreement on
the same input (SURVEY.md §2.12).
"""

from __future__ import annotations

import tempfile
import uuid

_EVENTS_DIR_CACHE: dict[tuple[int, str], str] = {}

from pyspark.sql import functions as F

from ..streaming.ingest import file_stream, watermarked_window_agg
from .registry import parity, table

_DEC18 = "decimal(18,6)"
_DEC38 = "decimal(38,6)"


@parity(
    "stream_live_windowed_agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS event_cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_live_windowed_agg(spark, sf_dir):
    """End-to-end streaming run over the events table.

    The driver's events parquet is TIMESTAMP(NANOS) (unreadable by a
    streaming scan), so the batch reader first lands it as a proper-timestamp
    parquet dir; the streaming query then treats that dir as an arriving
    file feed.
    """
    key = (id(spark._jsparkSession), sf_dir)
    if key not in _EVENTS_DIR_CACHE:
        src = tempfile.mkdtemp(prefix="fincan_stream_") + "/events"
        table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(src)
        _EVENTS_DIR_CACHE[key] = src
    src_dir = _EVENTS_DIR_CACHE[key]
    ckpt = tempfile.mkdtemp(prefix="fincan_stream_ckpt_")

    stream = file_stream(spark, src_dir, max_files_per_trigger=2)
    agg = watermarked_window_agg(
        stream,
        "ts",
        window="1 hour",
        watermark="1 hour",
        group_cols=("event_type",),
        aggs={
            "event_cnt": F.count(F.lit(1)),
            "total_value": F.sum(F.col("value").cast(_DEC18)).cast(_DEC38),
        },
    )
    name = f"stream_parity_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")  # emit every window; comparable to batch SQL
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "event_cnt",
        F.col("total_value").cast("double").alias("total_value"),
    )


@parity(
    "ns_sessionize_batch",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, epoch_us(ts) AS us,
               CAST(value AS DECIMAL(18,6)) AS val
        FROM events
    ),
    lagged AS (
        SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        FROM e
    ),
    marked AS (
        SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM lagged
    ),
    sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(val) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def ns_sessionize_batch(spark, sf_dir):
    """Gap-based (30 min) sessionization per user — lag-mark + running-sum
    session ids + rollup, one shuffle total (operators/sessionize.py). The
    streaming twin (applyInPandasWithState) is verified against this plan in
    tests/test_sessionize.py."""
    from ..operators.sessionize import sessionize_batch

    e = table(spark, sf_dir, "events").withColumn(
        "val", F.col("value").cast(_DEC18)
    )
    out = sessionize_batch(e, gap_minutes=30, value_col="val")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@parity(
    "stream_live_interval_join",
    oracle="""
    SELECT e.user_id, e.event_id AS err_id, epoch_us(e.ts) AS err_us,
           c.event_id AS click_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS micros_before
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND c.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
)
def stream_live_interval_join(spark, sf_dir):
    """REAL stream-stream join: error and click file streams joined on
    user_id within a 1-hour event-time band under watermarks, drained with
    availableNow into a memory sink — and hash-matching the batch
    inequality-join oracle. The band predicate on both event-time columns
    is what bounds the join state (streaming/ingest.py
    stream_stream_interval_join)."""
    import uuid as _uuid

    from ..streaming.ingest import stream_stream_interval_join

    key = (id(spark._jsparkSession), sf_dir)
    if key not in _EVENTS_DIR_CACHE:
        src = tempfile.mkdtemp(prefix="fincan_stream_") + "/events"
        table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(src)
        _EVENTS_DIR_CACHE[key] = src
    src_dir = _EVENTS_DIR_CACHE[key]

    ev = file_stream(spark, src_dir, max_files_per_trigger=4)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = stream_stream_interval_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="err_ts",
        right_ts="click_ts",
        lower="INTERVAL 1 HOUR",
        upper="INTERVAL 0 SECONDS",
        watermark="2 hours",
    )
    name = f"stream_ssij_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # the only mode stream-stream joins support
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fincan_ssij_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        "user_id",
        "err_id",
        F.unix_micros("err_ts").alias("err_us"),
        "click_id",
        (F.unix_micros("err_ts") - F.unix_micros("click_ts")).alias("micros_before"),
    )
