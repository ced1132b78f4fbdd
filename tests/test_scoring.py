"""Corpus-statistics scoring operators (operators/scoring.py): BM25
retrieval and unigram-LM quality signals — value checks on hand-computed
fixtures plus plan-shape pins for the scale-critical properties (single
stats broadcast, TakeOrdered top-k, broadcast vocab join)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.scoring import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    unigram_lm_scores,
    unigram_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join spark spark"),
            (2, "join vector join"),
            (3, "table scan filter"),
            (4, "spark"),
        ],
        ["doc_id", "text"],
    )


def _bm25_ref(tf, dl, n_docs, df, avgdl, k1=BM25_K1, b=BM25_B, ln=False):
    score = 0.0
    for t, d in zip(tf, df):
        odds = (n_docs - d + 0.5) / (d + 0.5)
        idf = math.log(1.0 + odds) if ln else odds
        score += (idf * (t * (k1 + 1.0))) / (t + (k1 * ((1.0 - b) + (b * (dl / avgdl)))))
    return score


def test_bm25_matches_hand_computation(spark, docs):
    rows = {
        r["id"]: r
        for r in bm25_topk(docs, "doc_id", "text", ["spark", "vector"], k=4).collect()
    }
    # corpus: N=4, dl = [4, 3, 3, 1], avgdl = 11/4; df(spark)=2, df(vector)=1
    avgdl = 11 / 4
    assert rows[1]["score"] == pytest.approx(
        _bm25_ref([3, 0], 4, 4, [2, 1], avgdl), abs=0.0
    )
    assert rows[2]["score"] == pytest.approx(
        _bm25_ref([0, 1], 3, 4, [2, 1], avgdl), abs=0.0
    )
    assert rows[3]["score"] == 0.0 and rows[3]["matched_terms"] == 0
    assert rows[1]["matched_terms"] == 1 and rows[2]["matched_terms"] == 1
    # ranks follow (score desc, id)
    ranked = sorted(rows.values(), key=lambda r: r["rank"])
    scores = [r["score"] for r in ranked]
    assert scores == sorted(scores, reverse=True)


def test_bm25_ln_idf_mode(spark, docs):
    rows = {
        r["id"]: r
        for r in bm25_topk(
            docs, "doc_id", "text", ["spark"], k=4, idf="ln"
        ).collect()
    }
    assert rows[1]["score"] == pytest.approx(
        _bm25_ref([3], 4, 4, [2], 11 / 4, ln=True), rel=1e-12
    )


def test_bm25_plan_shape(spark, docs):
    plan = (
        bm25_topk(docs, "doc_id", "text", ["spark", "vector"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stats join is a 1-row broadcast; top-k is per-partition TakeOrdered,
    # never a full sort shuffle; the tokenizer runs once per scan branch
    # (scoring side + stats side), NOT once per query term
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("split(lower") == 2, plan


def test_unigram_lm_self_scoring(spark, docs):
    out = {r["id"]: r for r in unigram_lm_scores(docs, "doc_id", "text").collect()}
    # corpus tokens: spark x4, join x3, vector x1, table/scan/filter x1 -> total 11
    assert out[4]["n_tokens"] == 1
    assert out[4]["oov_tokens"] == 0
    assert out[4]["sum_freq"] == 4  # "spark" occurs 4 times corpus-wide
    assert out[4]["mean_token_prob"] == pytest.approx(4 / 11, abs=1e-6)
    assert out[1]["min_freq"] == 3 and out[1]["max_freq"] == 4


def test_unigram_lm_oov_and_reference_vocab(spark, docs):
    vocab = unigram_table(docs.filter(F.col("doc_id") <= 2), "text")
    out = {
        r["id"]: r
        for r in unigram_lm_scores(
            docs.filter(F.col("doc_id") >= 3), "doc_id", "text", vocab=vocab
        ).collect()
    }
    # vocab = {spark:3, join:3, vector:1}, total 7; doc 3 is fully OOV
    assert out[3]["oov_tokens"] == 3
    assert out[3]["sum_freq"] == 0
    assert out[3]["mean_token_prob"] == 0.0
    assert out[3]["min_freq"] is None
    assert out[4]["oov_tokens"] == 0
    assert out[4]["mean_token_prob"] == pytest.approx(3 / 7, abs=1e-6)


def test_unigram_lm_surprisal_mode(spark, docs):
    out = {
        r["id"]: r
        for r in unigram_lm_scores(docs, "doc_id", "text", surprisal=True).collect()
    }
    assert out[4]["mean_surprisal"] == pytest.approx(-math.log(4 / 11), rel=1e-12)


def test_unigram_lm_plan_broadcasts_vocab(spark, docs):
    plan = (
        unigram_lm_scores(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # vocab joins broadcast (never shuffles the exploded corpus tokens) and
    # the per-doc aggregate partials map-side
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
