"""Streaming sessionization (applyInPandasWithState) vs the batch plan.

The stream emits CLOSED sessions only (the per-user last session stays open
— no watermark timeout), so the expected set is the batch sessionization
minus each user's final session. The input is delivered in two separate
``availableNow`` runs sharing one checkpoint, proving open-session state
survives a query restart via the state store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.sessionize import (
    SESSION_SCHEMA,
    sessionize_batch,
    sessionize_stream,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import table
from financial_data_ingestion_canonical_snowflake_spark.streaming.ingest import file_stream

from .conftest import SF_SMOKE

GAP_MIN = 30


def test_stream_sessionize_matches_batch_with_restart(spark, tmp_path):
    events = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "value", "event_id")
        .filter(F.col("user_id") < 40)  # keep the state fan-out small
    )

    # split by global median time; run 1 sees the early half, run 2 the late
    median_us = events.select(
        F.expr("percentile_approx(unix_micros(ts), 0.5)").alias("m")
    ).first().m
    early = events.filter(F.unix_micros("ts") <= median_us)
    late = events.filter(F.unix_micros("ts") > median_us)
    in_dir, out_dir, ckpt = f"{tmp_path}/in", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    early.coalesce(1).write.mode("overwrite").parquet(in_dir)

    def run_once():
        stream = file_stream(spark, in_dir, schema=events.schema)
        sessions = sessionize_stream(stream, gap_minutes=GAP_MIN)
        q = (
            sessions.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()  # run 1: early half
    late.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()  # run 2: restart from checkpoint, late half arrives

    got = spark.read.schema(SESSION_SCHEMA).parquet(out_dir)

    full = sessionize_batch(events, gap_minutes=GAP_MIN)
    w_last = F.max("session_start").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("user_id")
    )
    want = (
        full.withColumn("last_start", w_last)
        .filter(F.col("session_start") != F.col("last_start"))
        .drop("last_start")
    )

    got_rows = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in got.collect()
    )
    want_rows = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in want.collect()
    )
    assert got_rows == want_rows
    assert len(got_rows) > 0
