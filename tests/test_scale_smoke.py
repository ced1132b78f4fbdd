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
