"""Load-audit capture: the RESULT_SCAN(LAST_QUERY_ID()) emulation (S11).

The reference inserts per-COPY telemetry into RAW_LOAD_AUDIT immediately
after each COPY (``/root/reference/sql/01_raw_ingestion.sql:74-86``). Spark
has no RESULT_SCAN; the same facts are computed from the raw DataFrame
itself: per source file, rows parsed / loaded / errored and the first error,
with Snowflake-style load_status semantics:

    LOADED            all rows loaded
    PARTIALLY_LOADED  some rows loaded, some errored (ON_ERROR='CONTINUE')
    LOAD_FAILED       nothing loaded
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_load_audit(
    raw: DataFrame, file_type: str, load_ts: Column | None = None
) -> DataFrame:
    """One audit row per source file (reference :50-59 schema)."""
    err = F.col("_load_error")
    agg = raw.groupBy("src_file").agg(
        F.count(F.lit(1)).alias("rows_parsed"),
        F.sum(F.when(err.isNull(), 1).otherwise(0)).alias("rows_loaded"),
        F.sum(F.when(err.isNotNull(), 1).otherwise(0)).alias("errors_seen"),
        # first error = error text at the LOWEST erroring row number; MIN of
        # a (row_number, error) struct skips NULL (clean) rows entirely —
        # min_by over all rows would return NULL whenever row 1 was clean
        F.min(
            F.when(
                err.isNotNull(),
                F.struct(F.col("src_row_number").alias("rn"), err.alias("e")),
            )
        )["e"].alias("first_error"),
    )
    status = (
        F.when(F.col("errors_seen") == 0, "LOADED")
        .when(F.col("rows_loaded") > 0, "PARTIALLY_LOADED")
        .otherwise("LOAD_FAILED")
    )
    return agg.select(
        "src_file",
        F.lit(file_type).alias("file_type"),
        status.alias("load_status"),
        F.col("rows_parsed").cast("long"),
        F.col("rows_loaded").cast("long"),
        F.col("errors_seen").cast("long"),
        "first_error",
        (load_ts if load_ts is not None else F.current_timestamp()).alias("load_ts"),
    )
