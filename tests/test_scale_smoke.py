"""Scale smoke: the dedup closure on an 8x-replicated sf0.1 corpus.

Gated behind SPARK_GRAFT_SCALE_SMOKE=1 (about 15 s of pure compute — too
heavy for the default suite, cheap enough to run on demand):

    SPARK_GRAFT_SCALE_SMOKE=1 python -m pytest tests/test_scale_smoke.py -q

Measured reference (local[32], round 6): 40,000 docs -> 155,726 LSH
candidate pairs in ~7 s, full connected-components closure (4,783 groups)
in ~6 s — per-doc cost roughly linear vs the sf0.01 fixtures, the
behavior the bucket-join design promises.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="set SPARK_GRAFT_SCALE_SMOKE=1 to run the 8x-corpus smoke",
)


def test_dedup_closure_scales_to_8x_corpus(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators import (
        text_dedup as td,
    )
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        connected_components,
    )

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    parts = []
    for i in range(8):
        # copies 0/1 identical (exact dups at volume); the rest get a
        # distinct prefix so cross-copy NEAR-dups dominate
        t = F.concat(F.lit(f"c{i} "), F.col("text")) if i > 1 else F.col("text")
        parts.append(
            base.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"), t.alias("text")
            )
        )
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    docs = docs.repartition(spark.sparkContext.defaultParallelism).persist()
    try:
        n_docs = docs.count()
        pairs = td.minhash_lsh_pairs(docs, "doc_id", "text")
        n_pairs = pairs.count()
        comp = connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            nodes=docs.select(F.col("doc_id").alias("node")),
        )
        n_nodes, n_groups = comp.agg(
            F.count(F.lit(1)), F.countDistinct("component")
        ).collect()[0]
    finally:
        docs.unpersist()
    assert n_docs == n_nodes  # every doc labeled
    # near-dup copies must collapse: far fewer groups than docs, and at
    # least the ~5k per-base-doc clusters exist
    assert n_pairs > n_docs
    assert 1000 < n_groups < n_docs // 4


def test_ann_and_semantic_dedup_scale_to_8x_corpus(spark):
    """8x-replicated embedding corpus (16,000 x 64-dim at sf0.1): exact
    replicas must be recovered by semantic dedup (cosine 1.0 within a
    cluster), and LSH top-k must keep returning full result sets whose
    top-1 for a replicated query is its exact twin. Structure checks, not
    timings — the point is that the bucketed joins still behave at 8x."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.similarity import (
        lsh_topk,
        semantic_dedup,
    )

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    corpus = None
    for i in range(8):
        part = base.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"), "embedding"
        )
        corpus = part if corpus is None else corpus.unionByName(part)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism).cache()
    assert corpus.count() == 8 * n_base

    # semantic dedup at threshold 1.0-epsilon: each base vector has 7 exact
    # replicas; every cluster-sharing replica set keeps exactly its lowest id
    out = semantic_dedup(corpus, threshold=0.999999, n_centroids=32)
    kept = out.filter(F.col("is_kept")).count()
    # replicas land in the same cluster (identical vectors -> identical
    # assignment), so at most one survivor per base vector...
    assert kept <= n_base + 8  # slack for max_by ties: identical cosines
    # ...and nothing below the base count (distinct base vectors never match
    # at ~1.0 in this corpus: max pairwise cosine ~0.51)
    assert kept >= n_base

    # LSH top-k over the replicated corpus: queries are the first 20 base
    # vectors; each has 7 identical twins, so top-1 must be an exact twin
    queries = base.filter(F.col("vec_id") < 20)
    topk = lsh_topk(corpus, queries, k=5).cache()
    top1 = {r.query_id: (r.neighbor_id, r.cosine_sim)
            for r in topk.filter(F.col("rank") == 1).collect()}
    assert len(top1) == 20
    for qid, (nid, sim) in top1.items():
        assert nid % 1_000_000 == qid, (qid, nid)
        assert sim > 0.999999
    corpus.unpersist()
    topk.unpersist()


def test_line_dedup_scales_to_8x_corpus(spark):
    """Frequent-line removal over an 8x corpus (40k docs): the injected
    universal footer must disappear from EVERY document while per-doc
    content lines survive — and the drop-set broadcast keeps the pass at
    two shuffles regardless of corpus size."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.text_dedup import (
        frequent_line_removal,
    )

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        base.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"
        )
        for i in range(8)
    ]
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    with_lines = docs.select(
        "doc_id",
        F.concat(
            F.split(F.replace(F.col("text"), F.lit(" value "), F.lit(".\n")), "\n"),
            F.array(F.lit("subscribe to our newsletter today.")),
        ).alias("lines"),
    )
    out = frequent_line_removal(with_lines, "doc_id", "lines", max_doc_freq=100)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_dropped")).alias("dropped"),
        F.sum((F.col("n_dropped") >= 1).cast("long")).alias("docs_losing_footer"),
        F.sum(F.col("kept_text").contains("subscribe to our newsletter").cast("long")).alias(
            "footer_survivors"
        ),
    ).collect()[0]
    assert agg["n_docs"] == 8 * 5000
    assert agg["docs_losing_footer"] == agg["n_docs"]  # footer gone everywhere
    assert agg["footer_survivors"] == 0
