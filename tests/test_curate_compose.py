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


def test_curate_and_export_with_span_removal(spark, sf_oracle, tmp_path):
    """The remove_spans stage composed into the physical funnel equals the
    standalone batch operators chained by hand, the funnel stays monotone,
    and the removed-token accounting is real budget savings (shard token
    totals shrink by exactly the recomputed count of the cleaned text)."""
    from financial_data_ingestion_canonical_snowflake_spark.functions import (
        text as tx,
    )
    from financial_data_ingestion_canonical_snowflake_spark.operators.text_dedup import (
        remove_shared_spans,
    )

    docs = table(spark, sf_oracle, "documents").select("doc_id", "text")
    # inject shared boilerplate into a slice of documents so the span
    # stage has cross-document work the earlier gates can't catch
    boiler = " ".join(f"boilerplate{i} the of and to in is a" for i in range(12))
    carriers = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 700_000).alias("doc_id"),
        F.concat(F.lit(boiler + " "), F.col("text")).alias("text"),
    )
    corpus = docs.unionByName(carriers)

    manifest, report = curate_and_export(
        corpus, "doc_id", "text", str(tmp_path / "shards"),
        min_tokens=20, langs=("en",), budget=512, num_shards=4,
        fmt="jsonl", remove_spans=True, span_max_doc_freq=1,
    )
    # monotone funnel incl. the new stage; boilerplate actually scrubbed
    assert (
        report["input_docs"]
        >= report["after_quality"]
        >= report["after_language"]
        >= report["after_dedup"]
        >= report["after_span_removal"]
        > 0
    )
    assert report["span_tokens_removed"] > 0

    # compose the batch operators by hand over the same corpus
    base = corpus.select(
        "doc_id", "text", tx.tokens(F.col("text")).alias("__toks")
    )
    stats = tx.quality_stats(F.col("text"), toks=F.col("__toks"))
    gated = base.filter(
        (stats["n_tokens"] >= 20)
        & (stats["alpha_ratio"] >= 0.5)
        & tx.language_id(F.col("text"), toks=F.col("__toks")).isin("en")
    )
    from pyspark.sql.window import Window
    from financial_data_ingestion_canonical_snowflake_spark.functions import (
        scalars,
    )

    deduped = (
        gated.withColumn("__h", scalars.sha256_hex(tx.normalize_text(F.col("text"))))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__h").orderBy(F.col("doc_id").asc())
            ),
        )
        .filter("__rn = 1")
        .select("doc_id", "text")
    )
    expected = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_shared_spans(
            deduped, "doc_id", "text", divisor=8, max_doc_freq=1
        ).collect()
        if r["cleaned_text"]
    }
    assert len(expected) == report["after_span_removal"]

    # export equality: what's on disk IS the composed-batch result, with
    # token counts recomputed on the cleaned text
    back = spark.read.text(str(tmp_path / "shards")).select(
        F.from_json(
            "value", "doc_id long, seq_id long, tokens long, text string"
        ).alias("j")
    ).select("j.*")
    got = {r["doc_id"]: (r["text"], r["tokens"]) for r in back.collect()}
    assert set(got) == set(expected)
    for d, (txt, tok) in got.items():
        assert txt == expected[d], d
    recount = {
        r["doc_id"]: r["n"]
        for r in back.select(
            "doc_id", tx.bpe_ish_token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert all(got[d][1] == recount[d] for d in got)
    assert sum(r["n_tokens"] for r in manifest.collect()) == sum(
        n for _, n in got.values()
    )
