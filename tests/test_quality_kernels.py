"""Compression-ratio kernel (operators/quality_kernels.py): byte-exact vs
direct zlib, NULL/empty handling, and kernel-map (no shuffle) plan."""

from __future__ import annotations

import zlib

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.operators.quality_kernels import (
    compression_ratio,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import ALL_QUERIES


def test_compression_ratio_matches_zlib(spark):
    texts = [
        (1, "a" * 400),                      # degenerate repetition
        (2, "the quick brown fox " * 5),     # templated
        (3, "zq xv jk wm pl nt rb cd fg hy"),  # high-entropy
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for i, t in texts:
        raw = (t or "").encode("utf-8")
        assert got[i]["raw_len"] == len(raw)
        assert got[i]["compressed_len"] == len(zlib.compress(raw, 6))
        if raw:
            assert got[i]["compression_ratio"] == len(zlib.compress(raw, 6)) / len(raw)
        else:
            assert got[i]["compression_ratio"] is None
    # the signal orders as the heuristic promises
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[2]["compression_ratio"] < got[3]["compression_ratio"]


def test_compression_ratio_is_a_pure_map(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = (
        compression_ratio(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # kernel maps in place, no shuffle
    assert "MapInPandas" in plan


def test_registered_compression_query_runs(spark, sf_oracle):
    rows = ALL_QUERIES["ns_text_compression_ratio"](spark, sf_oracle).collect()
    assert len(rows) == 50
    ratios = [r["compression_ratio"] for r in rows]
    assert ratios == sorted(ratios)
