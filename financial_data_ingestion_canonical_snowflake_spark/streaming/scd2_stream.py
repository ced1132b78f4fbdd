"""Streaming SCD2 dimension maintenance: fold a change-event stream into a
persisted type-2 version table, micro-batch by micro-batch.

The streaming twin of ``operators.scd.scd2_build`` (the CDC → dimension
maintenance loop a warehouse runs continuously). Per micro-batch:

1. restrict the version table to the AFFECTED keys (batch keys only — an
   equi-join, so per-trigger cost scales with the batch, never the
   dimension);
2. re-expand those keys' versions to pseudo-events (state @ eff_from, with
   the stored ``eff_from_seq`` preserving tie-break order) and union the
   batch's events;
3. re-collapse with ``scd2_build`` — duplicate deliveries vanish in the
   lag-collapse, so a REPLAYED micro-batch after a restart recomputes the
   identical versions (idempotent, pytest-proven across a checkpoint
   restart);
4. fold back with ``merge_upsert`` keyed on (key, version_n). Version
   counts are monotone non-decreasing under re-collapse (adjacent versions
   differ by construction, so inserting events can only split runs, never
   merge them) — stale version rows cannot linger.

Late-data caveat: versions are COLLAPSED runs; an event older than the
key's current version boundary re-orders correctly against version *start*
points, but interior repeats collapsed away in earlier batches are gone —
a late event landing inside a long-collapsed run can coarsen history
relative to a from-scratch rebuild over the full event log. In-order
delivery per key (the watermarked-stream contract) gives exact equality
with the batch build; where late data beyond the watermark matters, run
:func:`rebuild_scd2` periodically — it re-collapses the version table from
the retained event log (the standard compaction story for incrementally
maintained state), and ``tests/test_streaming_scd2.py`` proves the
post-rebuild state equals the batch ``scd2_build`` after an out-of-order
late event coarsened the incrementally-folded history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import (
    PART_COL,
    maybe_rebucket,
    merge_upsert,
    merge_upsert_scoped,
    part_expr,
)
from ..operators.scd import scd2_build
from ..operators.storage import ParquetTable


class Scd2Sink:
    """foreachBatch sink maintaining an SCD2 version table (stored with the
    internal ``eff_from_seq`` tie-break column; ``versions()`` reads the
    public surface without it)."""

    def __init__(
        self,
        table: ParquetTable,
        key_col: str,
        state_col: str,
        ts_col: str,
        seq_col: str,
        rebucket_target_bytes: int | None = None,
        evolve_schema: bool = False,
    ):
        self.table = table
        self.key_col = key_col
        self.state_col = state_col
        self.ts_col = ts_col
        self.seq_col = seq_col
        # auto-split the bucketed version table past this mean bucket size
        # (merge.maybe_rebucket) — keeps per-trigger I/O batch-proportional
        # as the dimension grows without bound
        self.rebucket_target_bytes = rebucket_target_bytes
        # tolerate a version-table schema wider than this software writes
        # (an upgrade added columns, or an operator widened the table via
        # merge_upsert_scoped(evolve_schema=True)): untouched columns are
        # PRESERVED on matched versions instead of failing the fold — a
        # mid-stream widening never forces a dimension rebuild
        self.evolve_schema = evolve_schema

    def versions(self, spark: SparkSession) -> DataFrame:
        """The public SCD2 surface — identical schema to scd2_build."""
        return self.table.read(spark).drop("eff_from_seq")

    def _as_events(self, versions: DataFrame) -> DataFrame:
        return versions.select(
            F.col(self.key_col),
            F.col("state").alias(self.state_col),
            F.timestamp_micros(F.col("eff_from_us")).alias(self.ts_col),
            F.col("eff_from_seq").alias(self.seq_col),
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        scoped = self.table.partition_by == [PART_COL]
        events = batch_df.select(
            self.key_col, self.state_col, self.ts_col, self.seq_col
        )
        recomputed_src = events
        parts = None
        if self.table.exists():
            target = self.table.read(spark)
            affected = events.select(self.key_col).distinct()
            if scoped:
                # bucket-prune the version read to the batch keys' buckets
                # (same part_expr the table is laid out with), THEN key-join
                # — the dimension scan never leaves the batch's footprint
                n = self.table.read_meta()["n_buckets"]
                parts = [
                    r[0]
                    for r in affected.select(
                        part_expr(self.key_col, n).alias("p")
                    )
                    .distinct()
                    .collect()
                ]
                stored = self.table.stored_schema()
                reader = (
                    spark.read.schema(stored)  # evolved layout: mixed files
                    if stored is not None
                    else spark.read
                )
                target = (
                    reader.parquet(self.table.path)
                    .filter(F.col(PART_COL).isin(parts))
                    .drop(PART_COL)
                )
            touched = target.join(affected, self.key_col)  # batch-sized
            recomputed_src = self._as_events(touched).unionByName(events)
        recomputed = scd2_build(
            recomputed_src,
            self.key_col,
            self.state_col,
            self.ts_col,
            self.seq_col,
            with_seq=True,
        )
        if scoped:
            # keyed upsert (idempotent re-collapse — replay-safe); only the
            # affected keys' buckets are rewritten. The recomputed versions
            # carry exactly the affected keys, whose buckets were already
            # collected above — pass them through so the merge skips its
            # own touched-bucket action AND the source persist (r12: the
            # bucketed live drain paid two extra driver actions a trigger).
            merge_upsert_scoped(
                spark,
                self.table,
                recomputed,
                keys=[self.key_col, "version_n"],
                parts=parts,
                evolve_schema=self.evolve_schema,
            )
            if self.rebucket_target_bytes is not None:
                maybe_rebucket(spark, self.table, self.rebucket_target_bytes)
            return
        if self.table.exists():
            merged = merge_upsert(
                self.table.read(spark),
                recomputed,
                keys=[self.key_col, "version_n"],
                evolve_schema=self.evolve_schema,
            )
        else:
            merged = recomputed
        self.table.overwrite_atomic(merged)

    def rebuild(self, events: DataFrame) -> None:
        """Periodic rebuild: re-collapse the version table from the
        retained event log, discarding the incrementally-folded state.

        This is the executable mitigation of the module's late-data
        caveat: an out-of-order event folded after its run was collapsed
        can coarsen history, and only a from-scratch re-collapse over the
        full retained log restores the exact batch semantics. Cost is one
        batch ``scd2_build`` over the retained events (one shuffle on the
        key) — schedule it at the cadence your late-data SLA requires,
        and size the event-log retention window to cover the oldest
        lateness you need to repair; events already expired from the log
        are beyond what any rebuild can recover.
        """
        rebuilt = scd2_build(
            events.select(self.key_col, self.state_col, self.ts_col, self.seq_col),
            self.key_col,
            self.state_col,
            self.ts_col,
            self.seq_col,
            with_seq=True,
        )
        if self.table.partition_by == [PART_COL]:
            # a rebuild rewrites everything by definition; re-derive the
            # bucket layout so subsequent scoped folds keep pruning
            meta = self.table.read_meta()
            n = meta["n_buckets"] if meta else self.table.n_buckets
            rebuilt = rebuilt.withColumn(
                PART_COL, part_expr(self.key_col, n)
            ).repartition(n, F.col(PART_COL))
            self.table.overwrite_atomic(rebuilt)
            self.table.write_meta(
                n_buckets=n, part_col=PART_COL, keys=[self.key_col, "version_n"]
            )
            return
        self.table.overwrite_atomic(rebuilt)


def rebuild_scd2(
    spark: SparkSession,
    source_dir: str,
    table: ParquetTable,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> None:
    """Re-collapse ``table`` from the full retained event log under
    ``source_dir`` (the same directory :func:`stream_scd2` ingests). See
    :meth:`Scd2Sink.rebuild` for the late-data contract."""
    Scd2Sink(table, key_col, state_col, ts_col, seq_col).rebuild(
        spark.read.parquet(source_dir)
    )


def stream_scd2(
    spark: SparkSession,
    source_dir: str,
    table: ParquetTable,
    checkpoint_dir: str,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Stream a parquet change-event directory into an SCD2 version table.
    Returns the started StreamingQuery (``availableNow`` drains and stops).
    """
    from .dedup_stream import _start_parquet_batch_stream

    return _start_parquet_batch_stream(
        spark,
        source_dir,
        Scd2Sink(table, key_col, state_col, ts_col, seq_col),
        checkpoint_dir,
        max_files_per_trigger,
        available_now,
    )
