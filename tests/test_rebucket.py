"""Adaptive re-bucketing for scoped-merge state tables (VERDICT r12
next-step #1 — the last open 100 TB state-economics knob).

A scoped fold's per-trigger I/O is ``touched_buckets x mean_bucket_size``:
batch-proportional only while bucket count scales with state. ``rebucket``
splits a table to a larger modulus (atomic swap, NEW modulus pinned inside
the candidate before the swap), re-homing data rows by ``part_expr`` under
the new modulus and replicating each bucket's ledger row to its children —
under ``pmod``, ``x mod (m*n)`` determines ``x mod n``, so every child
inherits exactly one parent's applied-batch value. Proven here:

- logical state is invariant across a rebucket (data rows equal, layout
  dirs consistent with the new modulus, per-child ledgers inherited);
- scoped folds + per-bucket replay protection keep working across a
  rebucket, including through a REAL stream whose sink auto-splits
  mid-drain (``rebucket_target_bytes``);
- shrinking / non-multiple splits are refused (merging buckets cannot
  reconcile per-bucket ledgers — see the rebucket docstring).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.merge import (
    PART_COL,
    maybe_rebucket,
    merge_upsert_scoped,
    part_expr,
    rebucket,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.storage import (
    ParquetTable,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.text_dedup import (
    exact_dedup,
)
from financial_data_ingestion_canonical_snowflake_spark.streaming.dedup_stream import (
    LEDGER_HASH,
    ExactDedupSink,
    stream_exact_dedup,
)


from .helpers import bucketed_table as _bucketed
from .helpers import snapshot as _snapshot


def _docs(spark, lo, hi):
    # unique text per id (distinct content hashes -> survivor state grows
    # with the corpus) plus a deterministic sprinkle of exact duplicates
    return spark.createDataFrame(
        [
            (i, f"text body {i - 1 if i % 10 == 9 else i} tail")
            for i in range(lo, hi)
        ],
        ["doc_id", "text"],
    )


def _survivor_rows(spark, sink):
    return sorted(tuple(r) for r in sink.survivors(spark).collect())


def _ledgers(spark, table) -> dict[int, int]:
    """bucket -> applied batch id, straight off the sentinel rows."""
    return {
        r[0]: r[1]
        for r in spark.read.parquet(table.path)
        .filter(F.col("content_hash") == LEDGER_HASH)
        .select(PART_COL, "dup_cnt")
        .collect()
    }


def test_rebucket_preserves_state_and_rehomes_ledgers(spark, tmp_path):
    table = _bucketed(tmp_path, "survivors", n_buckets=4)
    sink = ExactDedupSink(table, "doc_id", "text")
    sink(_docs(spark, 0, 60), 0)
    sink(_docs(spark, 60, 120), 1)

    want = _survivor_rows(spark, sink)
    pre_ledger = _ledgers(spark, table)
    assert pre_ledger  # every written bucket carries a ledger row

    assert rebucket(spark, table, 16) == 16
    meta = table.read_meta()
    assert meta["n_buckets"] == 16
    # ledger layout survives in metadata for the next maintenance pass
    assert meta["ledger_sentinel"] == LEDGER_HASH

    # logical state invariant
    assert _survivor_rows(spark, sink) == want

    # every data row sits in the directory the NEW modulus assigns it
    misplaced = (
        spark.read.parquet(table.path)
        .filter(F.col("content_hash") != LEDGER_HASH)
        .filter(F.col(PART_COL) != part_expr("content_hash", 16))
        .count()
    )
    assert misplaced == 0

    # each child bucket inherits exactly its parent's applied-batch value
    post_ledger = _ledgers(spark, table)
    assert set(post_ledger) == {
        b + j * 4 for b in pre_ledger for j in range(4)
    }
    for child, applied in post_ledger.items():
        assert applied == pre_ledger[child % 4]


def test_rebucket_refuses_shrink_merge_and_unscoped(spark, tmp_path):
    table = _bucketed(tmp_path, "survivors", n_buckets=8)
    ExactDedupSink(table, "doc_id", "text")(_docs(spark, 0, 40), 0)
    with pytest.raises(ValueError, match="split-only"):
        rebucket(spark, table, 4)  # shrink
    with pytest.raises(ValueError, match="split-only"):
        rebucket(spark, table, 12)  # non-multiple
    with pytest.raises(ValueError, match="split-only"):
        rebucket(spark, table, 8)  # no-op modulus
    flat = ParquetTable(str(tmp_path / "flat"))
    flat.overwrite_atomic(_docs(spark, 0, 10))
    with pytest.raises(ValueError, match="not a scoped-merge table"):
        rebucket(spark, flat, 16)


def test_scoped_fold_and_replay_protection_across_rebucket(spark, tmp_path):
    table = _bucketed(tmp_path, "survivors", n_buckets=4)
    sink = ExactDedupSink(table, "doc_id", "text")
    sink(_docs(spark, 0, 60), 0)
    rebucket(spark, table, 8)

    # a FRESH sink (restart) folds under the new modulus ADOPTED from the
    # table metadata — the restart reconstructs the table with its
    # original SEED modulus (4), exactly what a checkpointed stream does
    # after an auto-rebucket grew the layout; the merge must follow the
    # stored modulus, not crash the stream on the validator
    sink2 = ExactDedupSink(
        ParquetTable(
            str(tmp_path / "survivors"), partition_by=[PART_COL], n_buckets=4
        ),
        "doc_id",
        "text",
    )
    sink2(_docs(spark, 60, 120), 1)
    union = _docs(spark, 0, 120)
    want = sorted(
        tuple(r) for r in exact_dedup(union, "doc_id", "text").collect()
    )
    assert _survivor_rows(spark, sink2) == want

    # per-bucket ledger replay protection survives the re-home: replaying
    # BOTH the pre-rebucket and post-rebucket batches changes nothing,
    # bytes included (the additive dup_cnt would double-count otherwise)
    state = _snapshot(table.path)
    sink2(_docs(spark, 0, 60), 0)
    sink2(_docs(spark, 60, 120), 1)
    assert _snapshot(table.path) == state


def test_maybe_rebucket_auto_splits_to_target(spark, tmp_path):
    table = _bucketed(tmp_path, "survivors", n_buckets=2)
    sink = ExactDedupSink(table, "doc_id", "text")
    sink(_docs(spark, 0, 400), 0)
    want = _survivor_rows(spark, sink)

    # generous target: no split
    assert maybe_rebucket(spark, table, target_bytes_per_bucket=1 << 30) is None
    assert table.read_meta()["n_buckets"] == 2

    # tiny target: splits to a power-of-two multiple, content invariant
    new_n = maybe_rebucket(spark, table, target_bytes_per_bucket=2048)
    assert new_n is not None and new_n > 2 and new_n % 2 == 0
    assert table.read_meta()["n_buckets"] == new_n
    assert _survivor_rows(spark, sink) == want

    # max_buckets is a hard ceiling
    assert (
        maybe_rebucket(
            spark, table, target_bytes_per_bucket=1, max_buckets=new_n
        )
        is None
    )


def test_auto_rebucket_mid_real_stream(spark, tmp_path):
    """A REAL availableNow drain whose sink auto-splits between triggers:
    the final state still equals the batch operator over everything
    ingested, and the layout grew past its seed modulus mid-stream."""
    src = str(tmp_path / "src")
    for lo, hi in [(0, 150), (150, 300), (300, 450)]:
        _docs(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)
    table = _bucketed(tmp_path, "survivors", n_buckets=2)
    q = stream_exact_dedup(
        spark,
        src,
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        rebucket_target_bytes=2048,
    )
    assert q.awaitTermination(180)
    sink = ExactDedupSink(table, "doc_id", "text", rebucket_target_bytes=2048)
    n_final = table.read_meta()["n_buckets"]
    assert n_final > 2, "the tiny target must have forced a mid-drain split"
    want = sorted(
        tuple(r)
        for r in exact_dedup(_docs(spark, 0, 450), "doc_id", "text").collect()
    )
    assert _survivor_rows(spark, sink) == want
    # replay after the splits is still a ledger no-op for the FOLD —
    # replay through a sink without the maintenance knob (maybe_rebucket
    # may legitimately rewrite the layout; the fold must not double-count)
    replay_sink = ExactDedupSink(table, "doc_id", "text")
    state = _snapshot(table.path)
    replay_sink(_docs(spark, 300, 450), 2)
    assert _snapshot(table.path) == state


def test_rebucket_without_ledger_keyed_table(spark, tmp_path):
    """Non-ledgered scoped tables (keyed idempotent folds) rebucket too —
    no sentinel handling, pure re-home."""
    table = _bucketed(tmp_path, "kv", n_buckets=4)
    df = spark.createDataFrame(
        [(f"k{i}", i) for i in range(100)], ["k", "v"]
    )
    merge_upsert_scoped(spark, table, df, keys=["k"])
    want = sorted(tuple(r) for r in table.read(spark).collect())
    rebucket(spark, table, 8)
    assert sorted(tuple(r) for r in table.read(spark).collect()) == want
    upd = spark.createDataFrame([("k5", 555), ("k200", 200)], ["k", "v"])
    merge_upsert_scoped(spark, table, upd, keys=["k"], n_buckets=8)
    got = dict(table.read(spark).collect())
    assert got["k5"] == 555 and got["k200"] == 200 and len(got) == 101


def test_total_bytes_tracker_maintained_by_writers(spark, tmp_path):
    """VERDICT r13 What's-wrong #3: maybe_rebucket's common no-split path
    reads a metadata-tracked byte count maintained by the writers
    (replace_partitions delta, overwrite_atomic measured) instead of
    walking the table per trigger. The tracker must match a real walk
    after initialization, stay correct across incremental merges and a
    rebucket, and a DRIFTED tracker must cost a corrective walk — never
    a wasted full-table rewrite."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.storage import (
        _parquet_bytes,
    )

    table = _bucketed(tmp_path, "survivors", n_buckets=2)
    sink = ExactDedupSink(table, "doc_id", "text")
    sink(_docs(spark, 0, 200), 0)
    # pre-tracking: first maybe_rebucket call walks once and initializes
    assert "total_bytes" not in table.read_meta()
    assert maybe_rebucket(spark, table, target_bytes_per_bucket=1 << 30) is None
    assert table.read_meta()["total_bytes"] == _parquet_bytes(table.path)

    # incremental merge: tracker follows via the touched-partition delta
    sink(_docs(spark, 200, 320), 1)
    assert table.read_meta()["total_bytes"] == _parquet_bytes(table.path)

    # rebucket rewrite: tracker re-measured by overwrite_atomic
    rebucket(spark, table, 8)
    assert table.read_meta()["total_bytes"] == _parquet_bytes(table.path)

    # drift upward (pretend the table is huge): the confirm walk corrects
    # the tracker and refuses the split
    meta = table.read_meta()
    table.write_meta(**{**meta, "total_bytes": 10 << 40})
    assert maybe_rebucket(spark, table, target_bytes_per_bucket=1 << 30) is None
    assert table.read_meta()["total_bytes"] == _parquet_bytes(table.path)
