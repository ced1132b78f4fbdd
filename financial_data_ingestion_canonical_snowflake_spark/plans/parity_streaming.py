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
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
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
    work = tempfile.mkdtemp(prefix="fincan_stream_")
    src_dir, ckpt = f"{work}/events", f"{work}/ckpt"
    table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(src_dir)

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
        "total_value",
    )
