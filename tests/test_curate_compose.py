"""End-to-end test for the composed curation operator
(operators/curate.py): funnel accounting, dedup survivorship, and shard
export in both formats."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.curate import (
    curate_and_export,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import table


def test_curate_and_export_parquet(spark, sf_oracle, tmp_path):
    docs = table(spark, sf_oracle, "documents").select("doc_id", "text")
    # inject exact duplicates so the dedup stage has work
    dups = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dups)

    manifest, report = curate_and_export(
        corpus, "doc_id", "text", str(tmp_path / "shards"),
        min_tokens=20, langs=("en",), budget=512, num_shards=4,
    )
    rows = manifest.collect()

    # funnel accounting is monotone and starts at the input size
    assert report["input_docs"] == corpus.count()
    assert (
        report["input_docs"]
        >= report["after_quality"]
        >= report["after_language"]
        >= report["after_dedup"]
        > 0
    )
    # the injected duplicates reached dedup (same text as their base, so
    # the gates treat them identically) and were collapsed
    assert report["after_dedup"] < report["after_language"]

    # export preserves the survivor corpus exactly
    assert sum(r["n_docs"] for r in rows) == report["after_dedup"]
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == report["after_dedup"]
    # survivor = min id per text hash: an injected copy (id+500000) can
    # never out-survive its base, so no injected id appears on disk
    surviving = {r.doc_id for r in back.select("doc_id").collect()}
    assert all(i < 500_000 for i in surviving)


def test_curate_and_export_jsonl(spark, sf_oracle, tmp_path):
    docs = table(spark, sf_oracle, "documents").select("doc_id", "text")
    manifest, report = curate_and_export(
        docs, "doc_id", "text", str(tmp_path / "jsonl"),
        min_tokens=20, langs=("en",), budget=512, num_shards=4, fmt="jsonl",
    )
    assert sum(r["n_docs"] for r in manifest.collect()) == report["after_dedup"]
    # jsonl shards parse back with the text intact
    back = spark.read.text(str(tmp_path / "jsonl")).select(
        F.from_json("value", "doc_id long, seq_id long, tokens long, text string").alias("j")
    )
    assert back.filter(F.col("j.text").isNull()).count() == 0
    assert back.count() == report["after_dedup"]


def test_curate_rejects_unknown_format(spark, sf_oracle, tmp_path):
    import pytest

    docs = table(spark, sf_oracle, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="unsupported shard format"):
        curate_and_export(docs, "doc_id", "text", str(tmp_path / "x"), fmt="csv")
