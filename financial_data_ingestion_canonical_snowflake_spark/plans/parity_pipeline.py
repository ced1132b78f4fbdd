"""Driver-facing end-to-end pipeline queries.

These run the full 9-stage reference pipeline (ingest -> canonical merge ->
anomalies -> ops views) over the FIXTURES.md example files and return the
canonical artifacts. DuckDB can't ingest the tri-format (XML) source files,
but the fixtures and ``batch_ts`` are pinned, so the expected output is a
fixed relation — the oracle is a VALUES literal of the verified expected
rows (semantics independently asserted in tests/test_pipeline_e2e.py),
upgrading the check from rows-only to full value-hash parity.
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


_PIPELINE_CACHE: dict[int, Pipeline] = {}


def _run_pipeline(spark: SparkSession) -> Pipeline:
    """Run the fixture pipeline once per session — both e2e parity queries
    (and repeated driver calls) read the same warehouse; the run is
    deterministic (pinned fixtures + batch_ts), so reuse is sound."""
    key = id(spark._jsparkSession)
    if key in _PIPELINE_CACHE:
        return _PIPELINE_CACHE[key]
    base = tempfile.mkdtemp(prefix="fincan_pipeline_")
    ingest_root = write_fixtures(os.path.join(base, "ingest"))
    cfg = PipelineConfig(
        ingest_root=ingest_root,
        warehouse=os.path.join(base, "warehouse"),
        batch_ts=_BATCH_TS,
    )
    pipe = Pipeline(spark, cfg)
    pipe.run_batch()
    _PIPELINE_CACHE[key] = pipe
    return pipe


_E2E_TXN_ORACLE = """
    SELECT canonical_txn_id, client_id, source_system, source_txn_id, txn_timestamp,
           currency, CAST(total_amount AS DOUBLE) AS total_amount, customer_id,
           account_id, merchant, is_valid, anomaly_codes_csv
    FROM (VALUES
        ('1343c87e2f3d4bd86b5e37311790ccd436827bfe114cad448a724aa46f033797', 'ClientA', 'CSV', 'TXN-3004', '2026-01-15 15:00:00', 'GBP', CAST(99.000000000 AS DECIMAL(38,9)), 'CUST-7', 'ACC-3', 'Wayne', TRUE, ''),
        ('318c93c05b6928a3cac8f6b45739157089b1b547534097a5d5cdb830e163ed8f', 'ClientC', 'JSON', 'TXN-1003b', '2026-01-17 08:05:00', 'USD', CAST(20.000000000 AS DECIMAL(38,9)), 'CUST-1', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), TRUE, ''),
        ('362cc34aef04659d026e7d9e7a2c9c9148132875263380efb2135a9e8059a2d8', 'ClientC', 'JSON', 'TXN-1005', '2026-01-19 09:00:00', 'USD', CAST(5.000000000 AS DECIMAL(38,9)), 'CUST-5', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), FALSE, 'DUPLICATE_TXN'),
        ('48e8690e38a7b1b9f8bca3a300890428152f0ab8dd8dde8fbe0d7ba86a1ea242', 'ClientA', 'XML', 'TXN-2005', '2026-01-20 10:00:00', 'EUR', CAST(15.000000000 AS DECIMAL(38,9)), 'CUST-2', 'ACC-3', 'Globex', TRUE, ''),
        ('71cbf269b0ee29ab741c587effb73c1f1d6a7155db9504e5eb44e532360f1222', 'ClientA', 'XML', 'TXN-2003', CAST(NULL AS VARCHAR), 'GBP', CAST(75.500000000 AS DECIMAL(38,9)), 'CUST-9', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), FALSE, 'MISSING_REQUIRED'),
        ('7e54d074af844bd431b76ebfcff694057e08d9116dfafce98d727696f52fc546', 'ClientC', 'JSON', 'TXN-1002', '2026-01-15 14:00:00', 'EUR', CAST(42.000000000 AS DECIMAL(38,9)), 'CUST-3', CAST(NULL AS VARCHAR), 'Umbrella', TRUE, ''),
        ('8dd5d028f41e1a2ee01eba77260cad4da61a91622ac24d382990ec056b202662', 'ClientC', 'JSON', '746478a73ba1e4a3edda18185e6b604791c177548d406fdf744be49d14a0d5f1', '2026-01-18 12:00:00', 'USD', CAST(NULL AS DECIMAL(38,9)), 'CUST-4', CAST(NULL AS VARCHAR), 'Hooli', FALSE, 'MISSING_REQUIRED'),
        ('91df31ff64986f6b0abcf749e518645abb745f7585c4f801d2ee4e249a24f9fb', 'ClientC', 'CSV', 'TXN-3006', '2026-01-16 10:00:00', CAST(NULL AS VARCHAR), CAST(55.000000000 AS DECIMAL(38,9)), 'CUST-8', 'ACC-9', 'Oscorp', TRUE, ''),
        ('943c5d8e10f807050a97defaee2a8f8c4c8064dc75ad7ba703fe0e900da910df', 'ClientA', 'CSV', 'TXN-3001', '2026-01-15 12:00:00', 'GBP', CAST(75.000000000 AS DECIMAL(38,9)), 'CUST-5', 'ACC-1', 'Initech', FALSE, 'DUPLICATE_TXN'),
        ('94adece1016dcd31ac746790e84513f693a8e5d33b7138b11cfce4a283358ac2', 'ClientA', 'CSV', 'TXN-3003', CAST(NULL AS VARCHAR), 'GBP', CAST(30.000000000 AS DECIMAL(38,9)), 'CUST-6', 'ACC-2', 'Stark', FALSE, 'MISSING_REQUIRED'),
        ('b502c8304cca61cf8d9f5291df175a8d56828ca867085a86c17c502de571d7bf', 'ClientC', 'CSV', 'TXN-3005', '2026-01-16 11:00:00', 'USD', CAST(NULL AS DECIMAL(38,9)), 'CUST-8', 'ACC-9', 'Oscorp', FALSE, 'MISSING_REQUIRED'),
        ('c074f15997b17b44a9d3d2ec9c883052199edf8ea0b11bb1e02a3527ec046f56', 'ClientC', 'JSON', 'TXN-1001', '2026-01-15 10:30:00', 'USD', CAST(125.500000000 AS DECIMAL(38,9)), 'CUST-9', 'ACC-7', 'Acme', TRUE, ''),
        ('d39f9ba6bd5c1e4d7c21646e530641eb73370d748a3de5aee22672d6f1bb67fe', 'ClientA', 'CSV', 'TXN-3002', '2026-01-15 13:00:00', 'GBP', CAST(-75.000000000 AS DECIMAL(38,9)), 'CUST-5', 'ACC-1', 'Initech', FALSE, 'NEGATIVE_AMOUNT'),
        ('d40dcca42fb32fd89cf606471b74c775113f58902c5f7e39b5de47ac705008b0', 'ClientC', 'JSON', 'TXN-1003a', '2026-01-17 08:00:00', 'USD', CAST(10.000000000 AS DECIMAL(38,9)), 'CUST-1', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), TRUE, ''),
        ('eab8437e90acf6178cf4b9102b67154e14ae0e0dbc7ab9ebd0e50d4c3f80c664', 'ClientA', 'XML', 'TXN-2002', '2026-01-16 09:30:00', 'USD', CAST(120.000000000 AS DECIMAL(38,9)), 'CUST-7', 'ACC-1', 'Initech', FALSE, 'DUPLICATE_TXN'),
        ('fea132aa9023ac1c908035d1f6784067365f16b7a04c9c0c4bf9f49c5723b33f', 'ClientA', 'XML', 'TXN-2001', '2026-01-15 11:00:00', 'EUR', CAST(-50.000000000 AS DECIMAL(38,9)), 'CUST-2', 'ACC-3', 'Globex', FALSE, 'NEGATIVE_AMOUNT')
    ) AS t(canonical_txn_id, client_id, source_system, source_txn_id, txn_timestamp, currency, total_amount, customer_id, account_id, merchant, is_valid, anomaly_codes_csv)
"""


@parity("pipeline_e2e_canonical_txn", oracle=_E2E_TXN_ORACLE)
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
        F.col("total_amount").cast("double").alias("total_amount"),
        "customer_id",
        "account_id",
        "merchant",
        "is_valid",
        F.array_join("anomaly_codes", ",").alias("anomaly_codes_csv"),
    )


_E2E_OPS_ORACLE = """
    SELECT * FROM (VALUES
        ('anomaly_counts', 'ClientA', 'CSV', 'DUPLICATE_TXN', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'CSV', 'MISSING_REQUIRED', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'CSV', 'NEGATIVE_AMOUNT', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'CSV', 'NEGATIVE_AMOUNT_LINE', CAST(4 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'CSV', 'NEGATIVE_QTY', CAST(4 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'XML', 'DUPLICATE_TXN', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'XML', 'MISSING_REQUIRED', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'XML', 'NEGATIVE_AMOUNT', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientA', 'XML', 'NEGATIVE_QTY', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientC', 'CSV', 'MISSING_REQUIRED', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientC', 'JSON', 'DUPLICATE_TXN', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('anomaly_counts', 'ClientC', 'JSON', 'MISSING_REQUIRED', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        ('canon_counts', 'ClientA', 'CSV', CAST(NULL AS VARCHAR), CAST(4 AS BIGINT), CAST(1 AS BIGINT)),
        ('canon_counts', 'ClientA', 'XML', CAST(NULL AS VARCHAR), CAST(4 AS BIGINT), CAST(1 AS BIGINT)),
        ('canon_counts', 'ClientC', 'CSV', CAST(NULL AS VARCHAR), CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        ('canon_counts', 'ClientC', 'JSON', CAST(NULL AS VARCHAR), CAST(6 AS BIGINT), CAST(4 AS BIGINT))
    ) AS t(view_name, client_id, source_system, anomaly_code, cnt, valid_cnt)
"""


@parity("pipeline_e2e_ops_views", oracle=_E2E_OPS_ORACLE)
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


_E2E_AUDIT_ORACLE = """
    SELECT * FROM (VALUES
        ('CSV', 'LOADED', CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT), '2026-02-01 00:00:00'),
        ('CSV', 'PARTIALLY_LOADED', CAST(1 AS BIGINT), CAST(6 AS BIGINT), CAST(5 AS BIGINT), CAST(1 AS BIGINT), '2026-02-01 00:00:00'),
        ('JSON', 'LOADED', CAST(6 AS BIGINT), CAST(7 AS BIGINT), CAST(7 AS BIGINT), CAST(0 AS BIGINT), '2026-02-01 00:00:00'),
        ('JSON', 'LOAD_FAILED', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), '2026-02-01 00:00:00'),
        ('XML', 'LOADED', CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(0 AS BIGINT), '2026-02-01 00:00:00')
    ) AS t(file_type, load_status, file_cnt, rows_parsed, rows_loaded, errors_seen, latest_load_ts)
"""


@parity("pipeline_e2e_audit_summary", oracle=_E2E_AUDIT_ORACLE)
def pipeline_e2e_audit_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VW_LOAD_AUDIT_SUMMARY (reference sql/07_ops_views.sql:6-14) over the
    fixture pipeline: per (file_type, load_status) file/row/error rollup of
    the RESULT_SCAN-emulated audit — including the LOAD_FAILED row from the
    intentionally-malformed JSON fixture (ON_ERROR='CONTINUE' semantics)."""
    pipe = _run_pipeline(spark)
    audit = pipe.raw_load_audit.read(spark)
    return audit.groupBy("file_type", "load_status").agg(
        F.count(F.lit(1)).alias("file_cnt"),
        F.sum("rows_parsed").alias("rows_parsed"),
        F.sum("rows_loaded").alias("rows_loaded"),
        F.sum("errors_seen").alias("errors_seen"),
        F.date_format(F.max("load_ts"), "yyyy-MM-dd HH:mm:ss").alias("latest_load_ts"),
    )
