"""k-means IVF quantizer: determinism + recall vs the lowest-id baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.operators import (  # noqa: E402
    similarity as sim,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    SYNTH_ID_OFFSET,
    table,
)

K = 5
N_CENTROIDS = 8
N_PROBE = 2


def _pairs(df) -> set[tuple]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def _recall(approx: set[tuple], exact: set[tuple]) -> float:
    return len(approx & exact) / len(exact)


def test_kmeans_centroids_deterministic(spark, sf_oracle):
    emb = table(spark, sf_oracle, "embeddings")
    a = sim.kmeans_centroids(emb, n_centroids=4, n_iter=2).collect()
    b = sim.kmeans_centroids(emb, n_centroids=4, n_iter=2).collect()
    assert sorted(r["vec_id"] for r in a) == [0, 1, 2, 3]
    va = {r["vec_id"]: r["embedding"] for r in a}
    vb = {r["vec_id"]: r["embedding"] for r in b}
    assert va == vb  # no RNG anywhere -> bit-identical retrain


def test_kmeans_exact_means_close_to_avg_and_assign_total(spark, sf_oracle):
    """The default exact-means trainer pins the per-dim mean through a
    decimal sum — the centroids must agree with the opt-out native-avg
    trainer to float-accumulation noise (they compute the same
    mathematical mean), and the public assign_to_centroids must label
    every vector exactly once."""
    emb = table(spark, sf_oracle, "embeddings")
    a = sim.kmeans_centroids(
        emb, n_centroids=4, n_iter=2, exact_means=False
    ).collect()
    b = sim.kmeans_centroids(emb, n_centroids=4, n_iter=2, exact_means=True).collect()
    va = {r["vec_id"]: r["embedding"] for r in a}
    vb = {r["vec_id"]: r["embedding"] for r in b}
    assert va.keys() == vb.keys()
    for k in va:
        assert max(abs(x - y) for x, y in zip(va[k], vb[k])) < 1e-9
    cents = sim.kmeans_centroids(emb, n_centroids=4, n_iter=2, exact_means=True)
    assign = sim.assign_to_centroids(emb, cents)
    n = emb.count()
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
    assert assign.filter(~assign.centroid_id.isin(0, 1, 2, 3)).count() == 0


def test_kmeans_ivf_recall_beats_lowest_id_quantizer(spark, sf_oracle):
    emb = table(spark, sf_oracle, "embeddings")
    # queries DISJOINT from both quantizers' candidate centroids: the
    # lowest-id quantizer's centroids ARE vectors 0..7, so evaluating on
    # queries < 20 hands it 8 self-centered probe lists and biases the
    # comparison (a query probing a list centered on itself trivially
    # finds its own neighborhood)
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    exact = _pairs(sim.brute_force_topk(emb, queries, k=K))

    lowest = _pairs(
        sim.ivf_topk(
            emb,
            queries,
            centroids=emb.filter(F.col("vec_id") < N_CENTROIDS),
            k=K,
            n_probe=N_PROBE,
        )
    )
    trained = _pairs(
        sim.ivf_topk(
            emb,
            queries,
            centroids=sim.kmeans_centroids(emb, n_centroids=N_CENTROIDS, n_iter=3),
            k=K,
            n_probe=N_PROBE,
        )
    )
    r_lowest, r_trained = _recall(lowest, exact), _recall(trained, exact)
    # the trained quantizer must beat the degenerate lowest-id one on an
    # unbiased query set, and find a real fraction of true neighbors
    # (measured: 0.55 trained vs 0.39 lowest-id on the sf0.01 corpus)
    assert r_trained >= r_lowest, (r_trained, r_lowest)
    assert r_trained >= 0.45, r_trained


# --------------------------------------------------------------------------
# Int8 quantization (functions/vectors.py)
# --------------------------------------------------------------------------


def test_int8_quantization_roundtrip_and_bounds(spark):
    from pyspark.sql import functions as F

    from financial_data_ingestion_canonical_snowflake_spark.functions.vectors import (
        dequantize_int8,
        int8_codes,
        int8_scale,
        max_abs_error,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 127.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [-0.001, 0.001, 0.0005, -0.0002]),
        ],
        ["vec_id", "v"],
    )
    s = df.select(
        "vec_id", "v", int8_scale(F.col("v")).alias("sc")
    ).select(
        "vec_id", "v", "sc", int8_codes(F.col("v"), F.col("sc")).alias("q")
    )
    out = {
        r["vec_id"]: r
        for r in s.select(
            "vec_id", "sc", "q",
            max_abs_error(F.col("v"), F.col("q"), F.col("sc")).alias("err"),
            dequantize_int8(F.col("q"), F.col("sc")).alias("deq"),
        ).collect()
    }
    # max-magnitude element maps exactly to +/-127
    assert out[1]["sc"] == 1.0
    assert out[1]["q"] == [1, -2, 1, 127]  # 0.5/1.0 rounds half away from zero
    # all-zero vector: zero scale, zero codes, zero error
    assert out[2]["sc"] == 0.0 and out[2]["q"] == [0, 0, 0, 0]
    assert out[2]["err"] == 0.0
    # codes stay in int8 range and error bounded by scale/2
    for r in out.values():
        assert all(-127 <= c <= 127 for c in r["q"])
        assert r["err"] <= r["sc"] / 2 + 1e-15
    # dequantized max element reconstructs exactly
    assert out[1]["deq"][3] == 127.0


def test_semantic_dedup_drops_injected_twins(spark, sf_oracle):
    from pyspark.sql import functions as F

    from financial_data_ingestion_canonical_snowflake_spark.operators.similarity import (
        semantic_dedup,
    )
    from financial_data_ingestion_canonical_snowflake_spark.plans.parity_vector import (
        _emb2,
    )

    out = semantic_dedup(
        _emb2(spark, sf_oracle), threshold=0.85, n_centroids=8
    ).cache()
    try:
        rows = {r["vec_id"]: r for r in out.collect()}
        # every dropped vector has a smaller-id same-cluster partner; a twin
        # whose original landed in the SAME cluster must be dropped
        by_cluster = {}
        for r in rows.values():
            by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
        for vid, r in rows.items():
            if vid >= SYNTH_ID_OFFSET and (vid - SYNTH_ID_OFFSET) in by_cluster.get(r["cluster_id"], []):
                assert not r["is_kept"], vid
        # originals with no smaller near-dup all survive
        assert all(r["is_kept"] for v, r in rows.items() if v < SYNTH_ID_OFFSET)
        assert out.filter(~F.col("is_kept")).count() > 0
    finally:
        out.unpersist()


def test_quantized_topk_recall_vs_exact(spark, sf_oracle):
    from pyspark.sql import functions as F

    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (
        ALL_QUERIES,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["ns_sim_bruteforce_topk"](spark, sf_oracle)
        .filter(F.col("rank") <= 5)
        .collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["ns_sim_quantized_topk"](spark, sf_oracle).collect()
        if r["query_id"] < 5  # bruteforce query set is vec_id < 5
    }
    exact = {p for p in exact if p[0] < 5}
    # int8 reconstruction error is ~scale/2 per element; top-5 neighbor sets
    # should survive quantization almost entirely
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, (recall, exact ^ quant)


def test_embedding_standardize_semantics(spark):
    """Standardized output has per-dim mean ~0 / std ~1; constant
    dimensions stay exactly 0 (divisor-1 guard); a train-moments table
    applies the TRAIN transform to a different split."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.embedding_stats import (
        embedding_dim_moments,
        standardize_embeddings,
    )

    rows = [(i, [float(i), 7.0, (-1.0) ** i * 2.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    std = standardize_embeddings(df)
    m2 = {r.pos: (r.mean, r.std) for r in embedding_dim_moments(std).collect()}
    assert abs(m2[0][0]) < 1e-9 and abs(m2[0][1] - 1.0) < 1e-6
    assert m2[1] == (0.0, 0.0)  # constant dim: centered to exactly 0
    assert abs(m2[2][0]) < 1e-9 and abs(m2[2][1] - 1.0) < 1e-6

    # train/serve: moments from the first half standardize the second half
    train = df.filter(F.col("vec_id") < 10)
    serve = df.filter(F.col("vec_id") >= 10)
    out = standardize_embeddings(serve, moments=embedding_dim_moments(train))
    got = {r.vec_id: r.embedding for r in out.collect()}
    tm = {r.pos: (r.mean, r.std) for r in embedding_dim_moments(train).collect()}
    assert abs(got[15][0] - (15.0 - tm[0][0]) / tm[0][1]) < 1e-12


def test_hierarchical_assignment_exact_when_probing_all_supers(spark, sf_oracle):
    """Two-level assignment with n_probe_super = #supers reaches every
    centroid, so it must EXACTLY reproduce the flat O(n*k) assignment
    (same cosine-desc, id-asc tie-breaks); with the default 2-probe
    budget it is the IVF approximation — assignments agree on the large
    majority of vectors and every assigned centroid id is valid."""
    emb = table(spark, sf_oracle, "embeddings")
    cents = emb.orderBy("vec_id").limit(16)
    flat = {
        r["vec_id"]: r["centroid_id"]
        for r in sim.assign_to_centroids(emb, cents).collect()
    }
    import math

    s = math.ceil(math.sqrt(16))
    full = {
        r["vec_id"]: r["centroid_id"]
        for r in sim.assign_to_centroids_hierarchical(
            emb, cents, n_probe_super=s
        ).collect()
    }
    assert full == flat

    approx = {
        r["vec_id"]: r["centroid_id"]
        for r in sim.assign_to_centroids_hierarchical(
            emb, cents, n_probe_super=2
        ).collect()
    }
    assert approx.keys() == flat.keys()  # every vector assigned exactly once
    # valid ids = the ACTUAL centroid frame's ids (not an assumed 0..15
    # range, which would make the containment check partially vacuous)
    valid = {r["vec_id"] for r in cents.select("vec_id").collect()}
    assert set(approx.values()) <= valid
    agree = sum(approx[k] == flat[k] for k in flat) / len(flat)
    # 0.69 measured on this corpus — near-random vectors are the WORST
    # case for a hierarchy (supers barely separate); clustered corpora,
    # where the n*k escape actually matters, agree far higher
    assert agree >= 0.6, agree


def test_semantic_dedup_hierarchical_route(spark, sf_oracle):
    """semantic_dedup(hierarchical=True) swaps only the assignment stage;
    with a full super-probe-equivalent small k the result must still drop
    every twin whose original shares its cluster (the same structural
    guarantee the flat route proves in test_semantic_dedup*)."""
    emb = table(spark, sf_oracle, "embeddings")
    out = sim.semantic_dedup(
        emb, threshold=0.999999, n_centroids=8, hierarchical=True
    )
    rows = out.collect()
    assert len(rows) == emb.count()  # one verdict per vector
    assert all(r["cluster_id"] is not None for r in rows)
    # at threshold ~1.0 only exact twins drop; the corpus has none, so
    # everything is kept — the hierarchical route must not invent drops
    assert all(r["is_kept"] for r in rows)


def test_semantic_dedup_auto_routes_flat_below_threshold(spark, sf_oracle):
    """hierarchical=None (the default) below HIERARCHICAL_K_THRESHOLD must
    be row-identical to the forced flat path — every oracle-certified
    scale (sf1 adaptive k = 79 is the largest) lives here, so the
    auto-route default cannot perturb a certified result."""
    emb = table(spark, sf_oracle, "embeddings")
    assert 8 < sim.HIERARCHICAL_K_THRESHOLD
    auto = sorted(map(tuple, sim.semantic_dedup(emb, n_centroids=8).collect()))
    flat = sorted(
        map(tuple, sim.semantic_dedup(emb, n_centroids=8, hierarchical=False).collect())
    )
    assert auto == flat


def test_semantic_dedup_auto_routes_hierarchical_above_threshold(spark, sf_oracle):
    """hierarchical=None at k >= HIERARCHICAL_K_THRESHOLD must take the
    two-level assignment: row-identical to the forced hierarchical path
    (same deterministic super subset and tie-breaks). A prebuilt
    ``centroids`` frame with no k hint stays flat by design (counting it
    could re-execute an expensive centroid pipeline)."""
    emb = table(spark, sf_oracle, "embeddings")
    k = sim.HIERARCHICAL_K_THRESHOLD + 44  # 172 of the 500 corpus vectors
    auto = sorted(map(tuple, sim.semantic_dedup(emb, n_centroids=k).collect()))
    hier = sorted(
        map(tuple, sim.semantic_dedup(emb, n_centroids=k, hierarchical=True).collect())
    )
    assert auto == hier
    # prebuilt-centroids fallback: flat, and still one verdict per vector
    pre = sim.semantic_dedup(
        emb, centroids=emb.orderBy("vec_id").limit(k)
    )
    flat = sim.semantic_dedup(
        emb, centroids=emb.orderBy("vec_id").limit(k), hierarchical=False
    )
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, flat.collect()))


def test_hierarchical_dedup_pair_recall_matches_flat(spark, sf_oracle):
    """The hierarchy's approximation cost, measured where it matters:
    per-vector assignment agreement with flat is only ~0.33 on
    structure-free vectors (p=2 — near-equidistant centroids make the
    'true' nearest arbitrary), but near-IDENTICAL vectors route through
    the same supers to the same cluster TOGETHER, so dedup pair recall
    tracks flat. Inject 60 near-copies into the 500-vector corpus and
    demand the routed path catches >= flat - 2 of them (measured at
    n=21k/k=256: 996 vs 999 of 1000)."""
    emb = table(spark, sf_oracle, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") < 60).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x + F.lit(1e-3)).otherwise(x),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(dups)
    k = sim.HIERARCHICAL_K_THRESHOLD  # forces the routed regime
    caught = {}
    for mode, hier in (("flat", False), ("hier", True)):
        out = sim.semantic_dedup(corpus, n_centroids=k, hierarchical=hier)
        dropped = {r["vec_id"] for r in out.filter(~F.col("is_kept")).collect()}
        caught[mode] = sum(
            1 for i in range(60) if i in dropped or (i + 1_000_000) in dropped
        )
    assert caught["flat"] >= 58, caught  # the injected pairs are real
    assert caught["hier"] >= caught["flat"] - 2, caught


def test_moments_parity_n_sweep(spark, tmp_path):
    """Regression for the two quotient-boundary classes (r8 verdict item 1):
    sweep synthetic corpora of n in {500, 512, 1000} vectors through the
    ns_embedding_moments probe/oracle pair and demand hash-exact parity.

    n=500/1000 divide 10^3 (the sf0.001 class: a scale-6 SUM/n quotient
    lands exactly on scale-6 half-way boundaries); n=512 is the power-of-2
    control; the 64-dim corpus at n=1000 is 64k values — twice the sf0.01
    draw where one ~1-in-30k per-row scale-12 cast disagreement landed.
    The fix under test: sum at DECIMAL(38,12), pin mean/ex2 outputs at
    DECIMAL(28,6) before std derives, identically on both engines.
    """
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from financial_data_ingestion_canonical_snowflake_spark.plans.parity_vector import (
        ns_embedding_moments,
    )
    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (
        ALL_ORACLE_SQL,
    )

    from .oracle_compare import compare

    dim = 64
    for n in (500, 512, 1000):
        rng = np.random.default_rng(n)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        # adversarial columns: constant, integer-valued, tiny multiples of
        # 1e-3 (exact at scale 6 after division by n | 10^3), and zeros
        vecs[:, 0] = 0.1234567
        vecs[:, 1] = rng.integers(-5, 6, n).astype(np.float32)
        vecs[:, 2] = (rng.integers(0, 1000, n) * 1e-3).astype(np.float32)
        vecs[:, 3] = 0.0
        sf_dir = tmp_path / f"n{n}"
        sf_dir.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                }
            ),
            str(sf_dir / "embeddings.parquet"),
        )
        df = ns_embedding_moments(spark, str(sf_dir))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        report = compare(df, con, ALL_ORACLE_SQL["ns_embedding_moments"])
        con.close()
        assert report["ok"], (n, report)


def test_adaptive_width_formulas():
    """Pin the integer-exact adaptive formulas at their boundaries — the
    oracle's threshold-CASE mirror depends on these exact values."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.similarity import (
        adaptive_n_centroids,
        adaptive_num_planes,
    )

    # clamp floor: everything up to 256*2^4 = 4096 gets 4 planes
    assert adaptive_num_planes(1) == 4
    assert adaptive_num_planes(500) == 4
    assert adaptive_num_planes(4096) == 4
    assert adaptive_num_planes(4097) == 5
    # sf1 fixture: 20k vectors -> 7 planes (256*2^7 = 32768 >= 20000)
    assert adaptive_num_planes(20_000) == 7
    assert adaptive_num_planes(16_384) == 6
    assert adaptive_num_planes(16_385) == 7
    # clamp ceiling
    assert adaptive_num_planes(10**12) == 24
    # expected width n/2^p stays in (128, 256] above the clamp floor
    for n in (5000, 33333, 10**6, 10**7):
        p = adaptive_num_planes(n)
        if 4 < p < 24:
            assert 128 < n / (1 << p) <= 256, (n, p)

    assert adaptive_n_centroids(1) == 8
    assert adaptive_n_centroids(500) == 8
    assert adaptive_n_centroids(2048) == 8
    assert adaptive_n_centroids(2049) == 9
    assert adaptive_n_centroids(20_000) == 79  # sf1 fixture
    assert adaptive_n_centroids(256 * 7 + 1) == 8


def test_semantic_hier_probe_is_nontrivial(spark, sf_oracle):
    """The forced-hierarchical driver probe (parity_vector.py
    ns_dedup_semantic_hier) must exercise the route where probing is a
    STRICT subset of the supers (p=2 of s=6 — otherwise it degenerates to
    the certified flat path) and must certify a NON-EMPTY drop set (the
    injected twins land in their originals' clusters through the shared
    super routing)."""
    import math

    from financial_data_ingestion_canonical_snowflake_spark.plans import (
        parity_vector as pv,
    )

    s = math.ceil(math.sqrt(pv._SEM_HIER_K))
    assert s > 2  # n_probe_super=2 probes a strict subset of the supers
    res = pv.ns_dedup_semantic_hier(spark, sf_oracle)
    dropped = res.filter(~F.col("is_kept")).count()
    assert dropped >= 1, "hier probe certifies an empty pairwise stage"
