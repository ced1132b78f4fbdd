"""Incremental canonicalization: the reference pipeline's stages 03+05 as a
stream (the medallion pattern the reference lists as backlog,
docs/architecture.md:132).

RAW (bronze) parquet tables — written by batch COPY emulation or any other
producer — are themselves a file source; this module streams newly-landed
raw rows through the SAME header transform and MERGE the batch path uses
(plans/transform_headers.py, operators/merge.py) via foreachBatch, so an
incremental run and a full batch run of the same inputs produce identical
canonical tables (asserted in tests/test_streaming.py).

Semantics note: W1 DUPLICATE_TXN detection inside one micro-batch matches
batch behavior; duplicates that arrive in DIFFERENT micro-batches are
handled by the merge (latest wins per canonical_txn_id — no duplicate rows,
exactly the reference's rerun story) but are not re-flagged, because that
would need unbounded cross-batch state. For unbounded streams needing the
flag, put ``streaming_dedupe`` (dropDuplicatesWithinWatermark) upstream.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.storage import ParquetTable
from ..plans.pipeline import CAN_TXN_COLS, scalars_is_valid
from ..plans.transform_headers import transform_headers
from .ingest import MergeSink, file_stream, start_merge_stream

_FMT_ARG = {"JSON": 0, "XML": 1, "CSV": 2}


def canonical_header_sink(
    can_txn: ParquetTable, source_system: str, batch_ts: dt.datetime | None = None
) -> MergeSink:
    """MergeSink running stage 03 (header transform) + stage 05a (CAN_TXN
    merge) on each raw micro-batch."""

    def transform(raw_batch: DataFrame) -> DataFrame:
        args: list[DataFrame | None] = [None, None, None]
        args[_FMT_ARG[source_system]] = raw_batch
        stg = transform_headers(*args)
        ts = F.lit(batch_ts).cast("timestamp") if batch_ts else F.current_timestamp()
        return (
            stg.filter(F.col("rn") == 1)
            .withColumn("is_valid", scalars_is_valid())
            .withColumn("created_ts", ts)
            .withColumn("updated_ts", ts)
            .select(*CAN_TXN_COLS)
        )

    return MergeSink(
        can_txn,
        keys=["canonical_txn_id"],
        preserve=["created_ts"],
        dedupe_order=[F.col("ingest_ts").desc(), F.col("src_file")],
        transform=transform,
    )


def stream_raw_to_canonical(
    spark: SparkSession,
    raw_dir: str,
    can_txn: ParquetTable,
    checkpoint_dir: str,
    source_system: str = "JSON",
    batch_ts: dt.datetime | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Stream a RAW bronze directory into the canonical header table."""
    stream = file_stream(
        spark, raw_dir, max_files_per_trigger=max_files_per_trigger
    )
    sink = canonical_header_sink(can_txn, source_system, batch_ts)
    return start_merge_stream(
        stream, sink, checkpoint_dir, available_now=available_now
    )
