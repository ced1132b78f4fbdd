"""Driver-facing end-to-end pipeline queries (rows-only checks).

These run the full 9-stage reference pipeline (ingest -> canonical merge ->
anomalies -> ops views) over the FIXTURES.md example files and return the
canonical artifacts. No ``oracle_sql`` twin exists — DuckDB can't ingest the
tri-format (XML) source files — so the driver records the weaker rows-only
check; the value-level assertions live in tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..examples import write_fixtures
from .pipeline import Pipeline, PipelineConfig
from .registry import parity

_BATCH_TS = dt.datetime(2026, 2, 1, 0, 0, 0)


def _run_pipeline(spark: SparkSession) -> Pipeline:
    base = tempfile.mkdtemp(prefix="fincan_pipeline_")
    ingest_root = write_fixtures(os.path.join(base, "ingest"))
    cfg = PipelineConfig(
        ingest_root=ingest_root,
        warehouse=os.path.join(base, "warehouse"),
        batch_ts=_BATCH_TS,
    )
    pipe = Pipeline(spark, cfg)
    pipe.run_batch()
    return pipe


@parity("pipeline_e2e_canonical_txn")
def pipeline_e2e_canonical_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline over the example files; returns CAN_TXN (stable,
    timestamp columns rendered with pinned formats)."""
    pipe = _run_pipeline(spark)
    txn = pipe.can_txn.read(spark)
    return txn.select(
        "canonical_txn_id",
        "client_id",
        "source_system",
        "source_txn_id",
        F.date_format("txn_timestamp", "yyyy-MM-dd HH:mm:ss").alias("txn_timestamp"),
        "currency",
        "total_amount",
        "customer_id",
        "account_id",
        "merchant",
        "is_valid",
        F.array_join("anomaly_codes", ",").alias("anomaly_codes_csv"),
    )


@parity("pipeline_e2e_ops_views")
def pipeline_e2e_ops_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline; returns VW_CANON_COUNTS ++ VW_ANOMALY_COUNTS
    (reference sql/07_ops_views.sql) as one tall table."""
    pipe = _run_pipeline(spark)
    canon = (
        pipe.can_txn.read(spark)
        .groupBy("client_id", "source_system")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("valid_cnt"),
        )
        .select(
            F.lit("canon_counts").alias("view_name"),
            "client_id",
            "source_system",
            F.lit(None).cast("string").alias("anomaly_code"),
            "cnt",
            "valid_cnt",
        )
    )
    anom = (
        pipe.can_txn_anomaly.read(spark)
        .groupBy("client_id", "source_system", "anomaly_code")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("anomaly_counts").alias("view_name"),
            "client_id",
            "source_system",
            "anomaly_code",
            "cnt",
            F.lit(None).cast("long").alias("valid_cnt"),
        )
    )
    return canon.unionByName(anom)
