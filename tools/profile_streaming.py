"""Profile the live streaming probes: run each drain once and dump the
per-micro-batch ``StreamingQueryProgress`` durationMs breakdown (addBatch,
getBatch, walCommit, commitOffsets, stateOperators commit times), which is
where the drain seconds actually go — the bench number alone cannot
attribute trigger cost to state I/O vs plan work vs harness latency.

Usage:  python tools/profile_streaming.py [probe ...]
Probes: windowed  scd2  interval  live_sinks  rebucket
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def show(label: str, q) -> None:
    print(f"== {label}: {len(q.recentProgress)} batches")
    for p in q.recentProgress:
        d = p["durationMs"]
        ops = p.get("stateOperators") or []
        state = "; ".join(
            f"{o.get('operatorName','?')}: commit={o.get('commitTimeMs')}ms "
            f"rows={o.get('numRowsTotal')} mem={o.get('memoryUsedBytes')}"
            for o in ops
        )
        print(
            f"  batch {p['batchId']}: total={p['batchDuration']}ms "
            f"addBatch={d.get('addBatch')} getBatch={d.get('getBatch')} "
            f"latestOffset={d.get('latestOffset')} "
            f"queryPlanning={d.get('queryPlanning')} "
            f"triggerExecution={d.get('triggerExecution')} "
            f"walCommit={d.get('walCommit')} commitOffsets={d.get('commitOffsets')} "
            f"rows={p['numInputRows']}"
        )
        if state:
            print(f"    state: {state}")


def main() -> None:
    wanted = set(sys.argv[1:]) or {"windowed", "scd2", "interval"}
    import __spark_entry__ as entrymod  # noqa: F401
    from financial_data_ingestion_canonical_snowflake_spark.session import get_spark

    spark = get_spark(app_name="fincan-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from financial_data_ingestion_canonical_snowflake_spark.plans import (
        parity_streaming as ps,
    )

    # monkeypatch-free: re-run the probe bodies but keep the query handle.
    # Each probe body is inlined minimally via the module's own helpers.
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    if "windowed" in wanted:
        t0 = time.perf_counter()
        src = ps._EVENTS_DIR_CACHE.get((id(spark._jsparkSession), sf_dir))
        if src is None:
            from financial_data_ingestion_canonical_snowflake_spark.plans.registry import table

            src = tempfile.mkdtemp(prefix="fincan_stream_") + "/events"
            table(spark, sf_dir, "events").repartition(4).write.mode(
                "overwrite"
            ).parquet(src)
            ps._EVENTS_DIR_CACHE[(id(spark._jsparkSession), sf_dir)] = src
        from financial_data_ingestion_canonical_snowflake_spark.streaming.ingest import (
            file_stream,
            watermarked_window_agg,
        )

        stream = file_stream(spark, src, max_files_per_trigger=2)
        agg = watermarked_window_agg(
            stream,
            "ts",
            window="1 hour",
            watermark="1 hour",
            group_cols=("event_type",),
            aggs={
                "event_cnt": F.count(F.lit(1)),
                "total_value": F.sum(
                    F.col("value").cast("decimal(18,6)")
                ).cast("decimal(38,6)"),
            },
        )
        name = f"prof_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="prof_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        print(f"windowed wall: {time.perf_counter()-t0:.2f}s")
        show("windowed", q)

    if "interval" in wanted:
        # the registered probe fn executes the drain and returns only the
        # result frame; progress is unreachable from it, so inline the body
        t0 = time.perf_counter()
        from financial_data_ingestion_canonical_snowflake_spark.plans.registry import table
        from financial_data_ingestion_canonical_snowflake_spark.streaming.ingest import (
            file_stream,
            stream_stream_interval_join,
        )

        key = (id(spark._jsparkSession), sf_dir)
        if key not in ps._EVENTS_DIR_CACHE:
            src = tempfile.mkdtemp(prefix="fincan_stream_") + "/events"
            table(spark, sf_dir, "events").repartition(4).write.mode(
                "overwrite"
            ).parquet(src)
            ps._EVENTS_DIR_CACHE[key] = src
        src_dir = ps._EVENTS_DIR_CACHE[key]
        ev = file_stream(spark, src_dir, max_files_per_trigger=4)
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id",
            F.col("event_id").alias("err_id"),
            F.col("ts").alias("err_ts"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
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
        name = f"prof_ssij_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="prof_ssij_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        print(f"interval wall: {time.perf_counter()-t0:.2f}s")
        show("interval", q)

    if "scd2" in wanted:
        from financial_data_ingestion_canonical_snowflake_spark.operators.merge import PART_COL
        from financial_data_ingestion_canonical_snowflake_spark.operators.storage import ParquetTable
        from financial_data_ingestion_canonical_snowflake_spark.streaming.scd2_stream import (
            stream_scd2,
        )

        t0 = time.perf_counter()
        src = ps._scd2_event_slices(spark, sf_dir)
        work = tempfile.mkdtemp(prefix="prof_scd2_")
        state = ParquetTable(
            work + "/versions", partition_by=[PART_COL], n_buckets=8
        )
        q = stream_scd2(spark, src, state, work + "/ckpt", max_files_per_trigger=1)
        q.awaitTermination(300)
        print(f"scd2 wall: {time.perf_counter()-t0:.2f}s")
        show("scd2", q)

    if "live_sinks" in wanted or "rebucket" in wanted:
        print("live_sinks/rebucket: run via bench subset; foreachBatch cost "
              "is profiled with tools/measure_sink_io.py instead")


if __name__ == "__main__":
    main()
