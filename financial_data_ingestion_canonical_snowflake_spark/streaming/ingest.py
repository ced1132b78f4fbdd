"""Structured-Streaming ingestion (SURVEY.md §2.12 north star).

The reference pipeline is batch-only — streams/tasks are an explicit backlog
item (reference docs/architecture.md:132). This module supplies the streaming
analog of each batch stage, built on the idiomatic Spark surfaces:

- file-source ``readStream`` with ``maxFilesPerTrigger`` / ``availableNow``
  gives COPY INTO's each-file-loaded-exactly-once semantics (the checkpoint
  plays the role of Snowflake's COPY load history);
- ``withWatermark`` + ``F.window`` for late-data-tolerant audit rollups
  (streaming twin of the VW_LOAD_AUDIT_SUMMARY / tumbling-agg queries);
- ``dropDuplicatesWithinWatermark`` for the W1 survivorship semantics on an
  unbounded stream (reference sql/03_transform_headers.sql:79);
- ``foreachBatch`` merge sink reusing the batch ``merge_upsert`` operator —
  arbitrary sinks can't MERGE, so each micro-batch runs the same full-outer
  merge the batch path uses (SURVEY.md §7.4-7).

Scale notes:
- State stores (window aggs, streaming dedupe) are keyed by the group/dedupe
  keys and bounded by the watermark — at 1000-executor scale state shards by
  ``spark.sql.shuffle.partitions``; set it to 2-3x cores BEFORE the first
  start (state-store partitioning is fixed at query start).
- The foreachBatch merge inherits the batch operator's properties: shuffle on
  merge keys only, AQE broadcast for small micro-batches.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.merge import merge_upsert
from ..operators.storage import ParquetTable


def file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """File-source readStream — the incremental COPY INTO.

    Streaming file sources require an explicit schema; pass one or we infer
    it from a one-off batch read of the existing files (fine for parquet,
    which is self-describing).
    """
    if schema is None:
        schema = spark.read.format(fmt).options(**options).load(path).schema
    reader = spark.readStream.format(fmt).schema(schema).options(**options)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def watermarked_window_agg(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = (),
    aggs: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Tumbling-window aggregate with late-data watermark.

    Streaming twin of the batch ``stream_tumbling_window_agg`` parity query;
    the same plan works on a batch DataFrame (watermark is a no-op there),
    which is how the oracle checks it.
    """
    aggs = aggs or {"event_cnt": F.count(F.lit(1))}
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *group_cols,
        *aggs.keys(),
    )


def streaming_dedupe(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """W1 survivorship on an unbounded stream.

    ``dropDuplicatesWithinWatermark`` keeps the FIRST row seen per key and
    expires key state once the watermark passes — the streaming counterpart
    of ``ROW_NUMBER() ... ORDER BY ingest_ts DESC`` survivorship (in a
    stream, "first seen" is the only causal choice; the batch path applies
    latest-wins when reprocessing).
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


class MergeSink:
    """foreachBatch sink: MERGE each micro-batch into a ParquetTable.

    Reuses the batch ``merge_upsert`` (full-outer join + atomic directory
    swap), so batch and streaming produce byte-identical canonical tables.
    Micro-batches may re-deliver rows after a restart (file source replays
    uncommitted batches); the merge is idempotent, which is the exactly-once
    story — same as the reference's rerun-safe MERGE
    (reference docs/architecture.md:88).
    """

    def __init__(
        self,
        table: ParquetTable,
        keys: Sequence[str],
        preserve: Sequence[str] = (),
        dedupe_order: Sequence | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ):
        self.table = table
        self.keys = list(keys)
        self.preserve = list(preserve)
        self.dedupe_order = dedupe_order
        self.transform = transform

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        spark = batch_df.sparkSession
        target = self.table.read(spark)
        merged = merge_upsert(
            target,
            batch_df,
            keys=self.keys,
            preserve=self.preserve,
            dedupe_order=self.dedupe_order,
        )
        self.table.overwrite_atomic(merged)


def start_merge_stream(
    source: DataFrame,
    sink: MergeSink,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Wire a streaming source into a MergeSink.

    ``available_now=True`` drains everything currently on disk then stops —
    the batch-boundary trigger used by incremental COPY jobs; pass
    ``processing_time`` for a long-running micro-batch cadence.
    """
    writer = (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
