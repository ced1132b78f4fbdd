"""Unit tests for C4-style line filtering (functions/text.py
c4_line_filters): first-failing-rule attribution, counter partition
invariant, order preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.functions.text import (
    c4_line_filters,
)

DOC = "\n".join(
    [
        "this line is long enough to keep.",   # kept
        "too short.",                          # short (2 words)
        "this line has no terminal punctuation at all",  # nopunct
        "this line mentions lorem ipsum boilerplate.",   # blocklist
        "enable javascript to view this page.",          # blocklist
        "another perfectly good sentence stays here!",   # kept
        "curly brace { should be dropped here.",         # blocklist
        "does this question survive the filter?",        # kept
    ]
)


def _one(spark):
    df = spark.createDataFrame([(1, DOC)], "doc_id long, text string").select(
        "doc_id", F.split("text", "\n").alias("lines")
    )
    stats = c4_line_filters(F.col("lines"))
    return df.select(
        stats["kept_lines"].alias("kept"),
        stats["n_lines"].alias("n_lines"),
        stats["n_short"].alias("n_short"),
        stats["n_nopunct"].alias("n_nopunct"),
        stats["n_blocklist"].alias("n_blocklist"),
    ).first()


def test_rule_attribution_and_partition(spark):
    row = _one(spark)
    assert row.n_lines == 8
    assert row.n_short == 1
    assert row.n_nopunct == 1
    assert row.n_blocklist == 3
    assert len(row.kept) == 3
    # counters partition the input exactly
    assert row.n_lines == len(row.kept) + row.n_short + row.n_nopunct + row.n_blocklist


def test_kept_lines_preserve_order(spark):
    row = _one(spark)
    assert row.kept == [
        "this line is long enough to keep.",
        "another perfectly good sentence stays here!",
        "does this question survive the filter?",
    ]


def test_empty_and_all_dropped(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "x.\nshort one here")], "doc_id long, text string"
    ).select("doc_id", F.split("text", "\n").alias("lines"))
    stats = c4_line_filters(F.col("lines"))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.size(stats["kept_lines"]).alias("n_kept"),
            stats["n_lines"].alias("n_lines"),
            stats["n_short"].alias("n_short"),
        ).collect()
    }
    # empty text -> one empty "line", dropped as short
    assert rows[1].n_lines == 1 and rows[1].n_kept == 0 and rows[1].n_short == 1
    assert rows[2].n_kept == 0
