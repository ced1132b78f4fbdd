"""Similarity-search operators over embedding columns (north-star ops).

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast, the
  corpus streams partition-parallel; correct baseline at any scale where
  |queries| is small.
- ``lsh_topk``: random-hyperplane LSH variant — queries only meet corpus
  vectors in their own bucket. This is the 100 TB path: the bucket equi-join
  shuffle-partitions cleanly and the per-bucket work is |bucket|^2 instead
  of |corpus|^2. Recall < 1 by construction (multi-probe/band-OR would raise
  it; kept single-probe for oracle checkability).
- ``cosine_near_dup_pairs``: near-duplicate detection by cosine threshold
  within LSH buckets (or exhaustively for small inputs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors


def adaptive_num_planes(n: int) -> int:
    """Corpus-scaled LSH plane count: smallest ``p`` with
    ``256 * 2**p >= n``, clamped to [4, 24] — i.e. ``ceil(log2(n/256))``
    computed in exact integer arithmetic (no float log2, so the DuckDB
    oracle's integer threshold-CASE mirror agrees at every n, boundaries
    included). Expected bucket width ``n / 2**p`` lands in (128, 256]
    above the clamp floor."""
    p = max(0, (max(1, math.ceil(n / 256)) - 1).bit_length())
    return min(24, max(4, p))


def adaptive_n_centroids(n: int) -> int:
    """Corpus-scaled SemDeDup quantizer size: ``max(8, ceil(n / 256))``
    targets a ~256-vector mean cluster so per-cluster pair work stays
    ~n * 256 = linear. Exact integer arithmetic, oracle-mirrorable as
    ``GREATEST(8, (n + 255) // 256)``."""
    return max(8, (n + 255) // 256)


# Flat-vs-hierarchical assignment crossover, measured on a 60k x 64-dim
# synthetic corpus (min of 2, noop sink, local[32], round 10): flat
# assignment cost is linear in k (k=32: 3.5s, 128: 8.4s, 512: 34.3s,
# 1024: 54.8s) while the two-level route stays ~sqrt(k) (3.3s / 3.7s /
# 5.7s / 5.1s) — the crossover sits near k = 64 and the gap reaches
# 6x at k=512, 10.7x at k=1024 (gated smoke:
# tests/test_scale_smoke.py::test_hierarchical_assignment_crossover).
# The auto-route default switches above the crossover, not at it: the
# flat assignment is exact, the hierarchy is the documented IVF
# approximation, so routing exists to escape the O(n*k) wall (k grows
# with the corpus under adaptive_n_centroids), not to shave a 2x where
# exactness is cheap. The threshold was 256 through round 10; the
# round-11 REAL-CORPUS decade sweep (BENCH_SF3.json) measured the flat
# path at k=235 — one notch below that threshold — costing 8.04x for 3x
# data (sf1 11.3s -> sf3 90.7s on 60k vectors) while the routed sf10
# step (k=782, 200k vectors, 3.33x more data) cost only 1.29x more than
# sf3 — the wall sat exactly in the [128, 256) gap the old threshold
# left open. 128 still clears every oracle-certified scale (sf1
# adaptive k = 79), so certified results remain flat-path bit-stable by
# construction; pass hierarchical=False to force exactness at any k.
HIERARCHICAL_K_THRESHOLD = 128


def _with_cosine(joined: DataFrame) -> DataFrame:
    """Cosine over a candidate join that carries per-side norm columns
    (``q_norm``/``c_norm``) when present — the norms then compute ONCE per
    vector before the join instead of once per candidate PAIR (a pair
    inlining ``sqrt(dot(v,v))`` on both sides triples the fold work of the
    pairwise stage, the hot loop of every candidate generator). Bit-identical
    either way: same IEEE ops in the same order, just evaluated earlier."""
    cols = set(joined.columns)
    if "q_norm" in cols and "c_norm" in cols:
        return joined.withColumn(
            "cosine_sim",
            vectors.dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
    return joined.withColumn(
        "cosine_sim", vectors.cosine(F.col("q_vec"), F.col("c_vec"))
    )


def _normed(df: DataFrame, vec_attr: str, out: str) -> DataFrame:
    """Project ``sqrt(dot(v, v))`` as a named column (attribute, so HOF
    consumers never re-fold it)."""
    return df.withColumn(out, vectors.norm(F.col(vec_attr)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, cosine_sim)."""
    q = _normed(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", "q_norm",
    )
    c = _normed(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", "c_norm",
    )
    scored = _with_cosine(F.broadcast(q).crossJoin(c)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the hyperplane-sign
    bucket; ranking inside the bucket is exact cosine."""
    planes = vectors.hyperplanes(num_planes, dim)
    q = _normed(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            vectors.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        ),
        "q_vec", "q_norm",
    )
    c = _normed(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            vectors.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        ),
        "c_vec", "c_norm",
    )
    scored = _with_cosine(F.broadcast(q).join(c, "bucket")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int | None = None,
    dim: int = 64,
    bucketed: bool = True,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.

    ``bucketed=True`` generates candidates within LSH buckets (the scale
    path); ``False`` compares all pairs (exact, quadratic).

    ``num_planes=None`` scales the hyperplane count to the corpus:
    ``ceil(log2(n / 256))`` clamped to [4, 24], computed in exact
    integer arithmetic (smallest p with 256 * 2**p >= n) so the DuckDB
    twin's threshold-CASE mirror agrees bit-for-bit — no float log2 on
    either side. For n above the 4-plane clamp this holds the EXPECTED
    bucket width in (128, 256], so candidate work stays ~n * width =
    linear; below the clamp (n <= 4096) the floor of 4 planes gives
    width ~n/16 <= 256 — stricter than the target, never looser. A
    FIXED plane count is quadratic at scale — per-bucket width grows
    with n, and the sf1 slope bench measured the fixed-6-plane probe at
    18x cost for 10x vectors while the adaptive setting holds the
    growth linear. Costs one bounded count() when defaulted — run over a
    PERSISTED (id, vec) projection so an expensive upstream lineage (a
    decode/feature pipeline, not a bare scan) executes once: the count
    materializes the cache both self-join sides then read; pass an
    explicit value for oracle-pinned probes. The cache deliberately
    outlives the call (the returned frame is lazy and reads it); the
    session owner drops it between query families — bench.py and the
    correctness driver clearCache per query."""
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    if bucketed and num_planes is None:
        base = base.persist()
        num_planes = adaptive_num_planes(base.count())
    a = _normed(
        base.select(F.col("__id").alias("id_a"), F.col("__vec").alias("q_vec")),
        "q_vec", "q_norm",
    )
    b = _normed(
        base.select(F.col("__id").alias("id_b"), F.col("__vec").alias("c_vec")),
        "c_vec", "c_norm",
    )
    if bucketed:
        planes = vectors.hyperplanes(num_planes, dim)
        a = a.withColumn("bucket", vectors.lsh_bucket(F.col("q_vec"), planes))
        b = b.withColumn("bucket", vectors.lsh_bucket(F.col("c_vec"), planes))
        joined = a.join(b, "bucket")
    else:
        joined = a.crossJoin(b)
    return (
        _with_cosine(joined)
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("cosine_sim") >= threshold))
        .select("id_a", "id_b", "cosine_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Classic two-level ANN: a small coarse-quantizer centroid set partitions
    the corpus into inverted lists (each vector assigned to its nearest
    centroid); a query probes only its ``n_probe`` nearest lists. At 100 TB
    the corpus shuffle is one hash-partition by centroid_id, the centroid
    set broadcasts everywhere, and per-query work drops to the probed lists
    — the standard trade of recall for a |corpus|/|lists| fan-in reduction.

    ``n_probe=None`` defaults to ``round(sqrt(#centroids))`` — on the
    measured recall curve (gated scale smoke prints it; sf0.01 sweep:
    8/16/32 centroids at sqrt-k probes -> recall\\@10 0.62/0.55/0.59)
    recall is governed by the probed FRACTION, and sqrt-k probes hold
    recall roughly flat as the quantizer grows while per-query fan-in
    still shrinks as |corpus|/sqrt(k). Costs one bounded count() of the
    centroid frame when defaulted.

    ``centroids`` defaults to the ``n_centroids`` lowest-id corpus vectors —
    deterministic (no RNG, no training loop) so the DuckDB oracle can derive
    the identical quantizer. A k-means-trained centroid table plugs into the
    same argument.
    """
    if centroids is None:
        centroids = corpus.orderBy(id_col).limit(n_centroids)
    if n_probe is None:
        n_probe = max(1, round(math.sqrt(centroids.count())))
    cents = F.broadcast(
        _normed(
            centroids.select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
            ),
            "cent_vec", "cent_norm",
        )
    )

    def assign(
        df: DataFrame, out_id: str, out_vec: str, out_norm: str, n_keep: int
    ) -> DataFrame:
        # vector norm projects once per vector, centroid norm once per
        # centroid — the k-way crossJoin then folds only the dot product
        scored = (
            _normed(
                df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec)),
                out_vec, out_norm,
            )
            .crossJoin(cents)
            .withColumn(
                "cent_sim",
                vectors.dot(F.col(out_vec), F.col("cent_vec"))
                / (F.col(out_norm) * F.col("cent_norm")),
            )
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("cent_sim"), F.asc("centroid_id"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_keep)
            .select(out_id, out_vec, out_norm, "centroid_id")
        )

    inv_lists = assign(corpus, "neighbor_id", "c_vec", "c_norm", 1)
    probes = assign(queries, "query_id", "q_vec", "q_norm", n_probe)

    scored = _with_cosine(probes.join(inv_lists, "centroid_id")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def ivf_topk_from_index(
    index: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int | None = None,
) -> DataFrame:
    """IVF top-k over an ALREADY-ASSIGNED inverted-list table
    ``(id_col, centroid_id, vec_col)`` — the query path for an index
    maintained incrementally (streaming/ivf_stream.py) or persisted from
    a prior build: corpus assignment is skipped entirely, so serving a
    query batch costs probe-assignment + the probed-list join, never a
    corpus re-scan. Row-identical to :func:`ivf_topk` over the same
    corpus/centroids (pytest-pinned): same probe rule (``n_probe``
    nearest lists, sqrt(k) default), same cosine, same
    (score desc, neighbor_id) tie-break."""
    if n_probe is None:
        n_probe = max(1, round(math.sqrt(centroids.count())))
    cents = F.broadcast(
        _normed(
            centroids.select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
            ),
            "cent_vec", "cent_norm",
        )
    )
    probes_scored = (
        _normed(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            ),
            "q_vec", "q_norm",
        )
        .crossJoin(cents)
        .withColumn(
            "cent_sim",
            vectors.dot(F.col("q_vec"), F.col("cent_vec"))
            / (F.col("q_norm") * F.col("cent_norm")),
        )
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    probes = (
        probes_scored.withColumn("crank", F.row_number().over(pw))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "q_vec", "q_norm", "centroid_id")
    )
    inv_lists = _normed(
        index.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        ),
        "c_vec", "c_norm",
    )
    scored = _with_cosine(probes.join(inv_lists, "centroid_id")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int | None = None,
    hierarchical: bool | None = None,
    n_probe_super: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023): cluster
    the embedding corpus with a coarse quantizer, compare pairs only WITHIN
    a cluster, and drop every vector that has a same-cluster partner with a
    smaller id and cosine >= ``threshold``.

    Returns ``(id_col, cluster_id, is_kept)`` for every corpus vector.

    Scale shape: centroid assignment is a broadcast crossJoin (k rows) with
    a map-side ``max_by`` collapse — the exchange carries one compact row
    per vector (the k-means assignment pattern). The pairwise stage is a
    self-join on ``cluster_id``: per-cluster quadratic IS the SemDeDup
    algorithm — at scale, cluster count must grow with the corpus so each
    cluster stays a few thousand vectors and the join never degenerates
    toward all-pairs. ``n_centroids=None`` enforces exactly that:
    ``max(8, ceil(n / 256))`` clusters targets a ~256-vector mean cluster
    width, making per-cluster pair work ~n * 256 = linear (the sf1 slope
    bench measured the fixed-8-cluster probe at 14x cost for 10x vectors,
    the adaptive default at ~7x; one bounded count() when defaulted).
    With k growing as n/256 the ASSIGNMENT term becomes n*k dot products;
    ``hierarchical=None`` (the default) therefore AUTO-ROUTES assignment
    through the sqrt(k) super-quantizer of
    :func:`assign_to_centroids_hierarchical` once k >=
    ``HIERARCHICAL_K_THRESHOLD`` (128 — measured crossover curve and the
    r11 real-corpus decade sweep at the constant). Below the threshold
    (every oracle-certified scale) the
    exact flat assignment runs unchanged; above it the assignment is the
    documented IVF approximation, the price of staying off the n*k wall.
    Force either route with ``hierarchical=True/False``.
    ``n_probe_super`` is the hierarchy's recall dial. Its approximation
    cost was measured on the WORST case (structure-free uniform vectors,
    n=20-21k): per-vector assignment agreement with flat is only
    0.22/0.33/0.43 at p=1/2/3 (k=256) — near-equidistant centroids make
    the "true" nearest arbitrary — but DEDUP PAIR RECALL is what the
    operator needs, and near-identical vectors route through the same
    supers to the same cluster TOGETHER: injected near-dup pairs are
    caught 996/1000 at k=256 and 999/1000 at k=512 with the default
    p=2, vs the exact flat path's 999/1000 (docs/BENCH_NOTES.md).
    Pair-recall parity with flat is regression-pinned in
    tests/test_similarity.py.
    ``centroids`` defaults to the lowest-id corpus
    vectors (deterministic, oracle-checkable); plug
    :func:`kmeans_centroids` in for real recall. On the hierarchical
    route the quantizer size ``k`` is forwarded only for the self-built
    default (``limit(n_centroids)``, whose cardinality is exact whenever
    n_centroids <= corpus size — always true for the adaptive default,
    which only routes hierarchically at n >= 256*128); a caller-supplied
    ``centroids`` frame is counted instead of trusting ``n_centroids``.
    """
    v = _normed(
        corpus.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v")),
        "__v", "__n",
    )
    # Persist the normed projection UNCONDITIONALLY (r15): it feeds every
    # later stage — default centroid pick, hierarchical assignment, flat
    # scoring, both pairwise sides, the final labeling. Without the cache
    # each consumer re-evaluates the whole upstream lineage: the forced-
    # hierarchical probe's plan was re-scanning its parquet source ~15x
    # (plans/r15/ns_dedup_semantic_hier_before.txt) — at 100 TB that is
    # 15 corpus passes for one dedup. The cache outlives this call by
    # design — the returned frame is lazy and still reads it; the session
    # owner drops it between query families (bench.py / the driver
    # clearCache per query).
    v = v.persist()
    if centroids is None and n_centroids is None:
        # count the persisted projection, not the raw corpus lineage — the
        # count doubles as the cache materializer (the text_dedup
        # discipline).
        n_centroids = adaptive_n_centroids(v.count())
    # every downstream consumer reads the cached projection, never the
    # caller's lineage (same rows/types by construction: the projection
    # only renames and adds the norm column)
    corpus = v.select(F.col("__vid").alias(id_col), F.col("__v").alias(vec_col))
    built_centroids = centroids is None
    if centroids is None:
        centroids = corpus.orderBy(id_col).limit(n_centroids)
    if hierarchical is None:
        # Auto-route (default): escape the O(n*k) flat-assignment wall
        # once the quantizer is large enough that the measured ~sqrt(k)
        # hierarchy decisively wins (HIERARCHICAL_K_THRESHOLD comment has
        # the curve). k is known for free when n_centroids was given or
        # derived adaptively; a caller passing only a prebuilt
        # ``centroids`` frame stays on the exact flat path (counting that
        # frame could re-execute an expensive centroid pipeline, e.g. a
        # kmeans_centroids train) — pass ``hierarchical=True`` explicitly
        # to route a large prebuilt quantizer.
        hierarchical = (
            n_centroids is not None and n_centroids >= HIERARCHICAL_K_THRESHOLD
        )
    if hierarchical:
        # route assignment through the sqrt(k) super-quantizer (the n*k
        # escape hatch documented above); the pairwise stage is identical.
        # k is known for free ONLY when this function built the quantizer
        # itself via limit(n_centroids) — pass it through then so the
        # assignment skips its centroid-count job (r15). A caller-supplied
        # centroids frame falls back to counting that frame: trusting an
        # accompanying n_centroids that disagrees with the frame's real
        # cardinality would silently mis-size the super-quantizer and
        # change assignments (ADVICE r15).
        h = assign_to_centroids_hierarchical(
            corpus, centroids, id_col=id_col, vec_col=vec_col,
            n_probe_super=n_probe_super,
            k=n_centroids if built_centroids else None,
        ).select(F.col(id_col).alias("__vid"), F.col("centroid_id").alias("cluster_id"))
        asg = v.join(h, "__vid").select("__vid", "cluster_id", "__v", "__n")
    else:
        cents = F.broadcast(
            _normed(
                centroids.select(
                    F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
                ),
                "cent_vec", "cent_norm",
            )
        )
        scored = v.crossJoin(cents).select(
            "__vid", "__v", "__n", "centroid_id",
            (
                vectors.dot(F.col("__v"), F.col("cent_vec"))
                / (F.col("__n") * F.col("cent_norm"))
            ).alias("__s"),
        )
        asg = scored.groupBy("__vid").agg(
            F.max_by(
                "centroid_id", F.struct(F.col("__s"), (-F.col("centroid_id")).alias("n"))
            ).alias("cluster_id"),
            F.first("__v").alias("__v"),
            F.first("__n").alias("__n"),
        )
    # the assignment feeds THREE consumers (both pairwise sides + the
    # final labeling join) — persist it so the n*k scoring (or the
    # hierarchical chain) runs once, not three times (r15; same cache
    # lifetime contract as ``v`` above)
    asg = asg.persist()
    a = asg.select(
        F.col("__vid").alias("id_a"), F.col("__v").alias("q_vec"),
        F.col("__n").alias("q_norm"), "cluster_id",
    )
    b = asg.select(
        F.col("__vid").alias("id_b"), F.col("__v").alias("c_vec"),
        F.col("__n").alias("c_norm"), "cluster_id",
    )
    dropped = (
        _with_cosine(a.join(b, "cluster_id"))
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("cosine_sim") >= threshold))
        .select(F.col("id_b").alias("__vid"))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return asg.join(dropped, "__vid", "left").select(
        F.col("__vid").alias(id_col),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("__dup").isNull().alias("is_kept"),
    )


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties to the lowest centroid
    id): ``(id_col, centroid_id)`` — the quantizer's public surface, shared
    by IVF inverted-list builds and the k-means trainer's own rounds.

    Same scale shape as the trainer's assignment step: the k centroids ride
    a broadcast crossJoin, scoring is map-side, and the max_by groupBy
    collapses a vector's k candidate rows map-side so the only exchange
    carries one row per vector.
    """
    # norms project ONCE per vector / per centroid (r16): the inlined
    # cosine folded dot(v,v) and dot(c,c) per PAIR — 3x the HOF work of
    # the n*k scoring loop. dot/(v_norm*cent_norm) is the same IEEE ops
    # in the same order, evaluated earlier — bit-identical scores.
    c = F.broadcast(
        _normed(
            centroids.select(
                F.col(id_col).cast("int").alias("centroid_id"),
                F.col(vec_col).cast("array<double>").alias("cent_vec"),
            ),
            "cent_vec", "cent_norm",
        )
    )
    scored = (
        _normed(
            corpus.select(
                F.col(id_col),
                F.col(vec_col).cast("array<double>").alias("__v"),
            ),
            "__v", "__n",
        )
        .crossJoin(c)
        .select(
            id_col,
            "centroid_id",
            (
                vectors.dot(F.col("__v"), F.col("cent_vec"))
                / (F.col("__n") * F.col("cent_norm"))
            ).alias("__s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("__s"), (-F.col("centroid_id")).alias("n")),
        ).alias("centroid_id")
    )


def assign_to_centroids_hierarchical(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_super: int = 2,
    k: int | None = None,
) -> DataFrame:
    """Two-level nearest-centroid assignment: ``(id_col, centroid_id)``.

    The flat assignment scores every vector against every centroid —
    O(n*k) dot products, which dominates once the cluster count itself
    scales with the corpus (SemDeDup at k = n/256). This routes through a
    sqrt(k)-sized SUPER-quantizer instead:

    1. supers = the sqrt(k) lowest-id centroids (deterministic subset);
    2. each centroid maps to its nearest super (k*sqrt(k) broadcast work,
       the result is centroid-count-sized and broadcasts);
    3. each vector probes its ``n_probe_super`` nearest supers
       (n*sqrt(k));
    4. the vector scores only the centroids of the probed supers
       (~n * p * sqrt(k)).

    Total n*(1+p)*sqrt(k) vs n*k — a 100x cut at k=65k, p=2. Approximate
    in the IVF sense: exact whenever the true nearest centroid's super is
    probed; ``n_probe_super = ceil(sqrt(k))`` probes every super and
    degenerates to the exact flat assignment (equivalence pinned in
    tests/test_similarity.py). Same tie-breaks as
    :func:`assign_to_centroids` (cosine desc, centroid id asc).
    """
    if k is None:
        # ``k`` can be passed by a caller that already knows the quantizer
        # size (semantic_dedup does) — the count job here exists only for
        # prebuilt centroid frames of unknown cardinality
        k = centroids.count()
    s = max(1, math.ceil(math.sqrt(k)))
    # per-side norms project once per centroid / super / vector (r16):
    # the inlined cosine re-folded both sides' self-dots per PAIR — 3x
    # the HOF work of every scoring stage below. dot/(a_norm*b_norm) is
    # the same IEEE ops in the same order — bit-identical scores.
    cents = _normed(
        centroids.select(
            F.col(id_col).cast("long").alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("cent_vec"),
        ),
        "cent_vec", "cent_norm",
    )
    supers = F.broadcast(
        cents.orderBy("centroid_id")
        .limit(s)
        .select(
            F.col("centroid_id").alias("super_id"),
            F.col("cent_vec").alias("super_vec"),
            F.col("cent_norm").alias("super_norm"),
        )
    )
    # centroid -> nearest super: centroid-count-sized, stays broadcastable
    cent2super = F.broadcast(
        cents.crossJoin(supers)
        .select(
            "centroid_id",
            "cent_vec",
            "cent_norm",
            "super_id",
            (
                vectors.dot(F.col("cent_vec"), F.col("super_vec"))
                / (F.col("cent_norm") * F.col("super_norm"))
            ).alias("__s"),
        )
        .groupBy("centroid_id", "cent_vec", "cent_norm")
        .agg(
            F.max_by(
                "super_id", F.struct(F.col("__s"), (-F.col("super_id")).alias("n"))
            ).alias("super_id")
        )
    )
    v = _normed(
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        ),
        "__v", "__n",
    )
    probed = (
        v.crossJoin(supers)
        .select(
            id_col,
            "__v",
            "__n",
            "super_id",
            (
                vectors.dot(F.col("__v"), F.col("super_vec"))
                / (F.col("__n") * F.col("super_norm"))
            ).alias("__ss"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.desc("__ss"), F.asc("super_id")
                )
            ),
        )
        .filter(F.col("__r") <= n_probe_super)
        .select(id_col, "__v", "__n", "super_id")
    )
    scored = probed.join(cent2super, "super_id").select(
        id_col,
        "centroid_id",
        (
            vectors.dot(F.col("__v"), F.col("cent_vec"))
            / (F.col("__n") * F.col("cent_norm"))
        ).alias("__s"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("__s"), (-F.col("centroid_id")).alias("n")),
        ).alias("centroid_id")
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iter: int = 5,
    exact_means: bool = True,
) -> DataFrame:
    """Deterministic Lloyd k-means coarse quantizer for ``ivf_topk``.

    Seeds are the ``n_centroids`` corpus vectors with the smallest
    ``md5(vec_id)`` — a fixed pseudo-random draw (no RNG, reproducible on
    any cluster size), which spreads seeds across the corpus far better
    than the lowest-id default quantizer. Then ``n_iter`` fixed Lloyd
    rounds; per round:

    - assignment is a PURE PROJECTION: the centroids inline as literal
      arrays (driver-held, k x dim doubles), so scoring every corpus
      vector against every centroid is map-side — zero shuffle, no join;
    - means recompute via posexplode + groupBy(centroid, dim) — ONE
      shuffle whose map-side partial aggregation reduces each partition
      to at most k x dim rows before the exchange;
    - the k x dim means collect to the driver (tiny), which also truncates
      lineage between rounds (no growing iterative plan).

    Empty clusters keep their previous centroid. At 100 TB each round is a
    full corpus pass (the standard k-means cost); train on a stratified
    sample (``functions.text.sample_bucket``) when a pass is too dear.

    ``exact_means=True`` (the DEFAULT — this is the production trainer)
    pins each per-(centroid, dim) mean through an order-independent
    DECIMAL(38,12) sum before one double division — scale 12 here,
    deliberately: the OUTPUT pins that certify the trainer
    (plans/parity_vector.py) round at scale 6, and quotients of scale-12
    sums sit generically far from 6-decimal rounding boundaries, whereas
    scale-6-sum quotients were observed landing close enough to those
    boundaries for the engines' double->decimal casts to disagree.
    Exact means make every Lloyd round bit-identical on ANY partitioning
    and cluster size (a float ``avg``'s partial-sum order varies with the
    shuffle) AND in the DuckDB oracle twin (plans/parity_vector.py
    unrolls the same fixed rounds in SQL) — so the trained quantizer is
    reproducible across retrains and cross-engine hash-certified, at the
    cost of a decimal aggregate in the same single per-round shuffle
    (same exchange shape; measured within noise of ``avg`` at sf0.1).
    ``exact_means=False`` opts back into the native float ``avg`` where
    last-ulp reproducibility genuinely doesn't matter.

    Returns ``(id_col = 0..k-1, vec_col array<double>)`` — plugs directly
    into ``ivf_topk(centroids=...)``.
    """
    from ..functions.scalars import md5_long

    spark = corpus.sparkSession
    seeds = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(md5_long(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    cents: list[list[float]] = [[float(x) for x in r[vec_col]] for r in seeds]
    # each round scans the vectors and there are n_iter rounds — cache once.
    # The vector norm is part of the cache (r16): every round's cosine then
    # folds only the dot product — the inlined cosine re-folded dot(v,v)
    # k times per vector per round and dot(c,c) n times per centroid
    # (bit-identical either way: same IEEE ops, same order).
    vecs = _normed(
        corpus.select(
            F.col(id_col).alias("__vid"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        ),
        "__v", "__n",
    ).persist()
    try:
        for _ in range(n_iter):
            # assignment rides a broadcast crossJoin (k rows) with ONE
            # top-level cosine column — the same shape ivf_topk's assign
            # uses. (Inlining centroids as literal arrays inside a
            # transform() lambda nests the fold HOFs k-deep per row and
            # falls off codegen — measured ~30x slower.) The broadcast
            # keeps a vector's k copies consecutive, so the max_by groupBy
            # collapses them map-side: the exchange carries one row per
            # vector — the standard per-round k-means shuffle.
            cdf = _normed(
                spark.createDataFrame(
                    [(i, cent) for i, cent in enumerate(cents)],
                    "centroid_id int, cent_vec array<double>",
                ),
                "cent_vec", "cent_norm",
            )
            scored = vecs.crossJoin(F.broadcast(cdf)).select(
                "__vid",
                "__v",
                "centroid_id",
                (
                    vectors.dot(F.col("__v"), F.col("cent_vec"))
                    / (F.col("__n") * F.col("cent_norm"))
                ).alias("__s"),
            )
            best = scored.groupBy("__vid").agg(
                # highest sim wins, ties to the lowest centroid id
                F.max_by(
                    "centroid_id",
                    F.struct(F.col("__s"), (-F.col("centroid_id")).alias("n")),
                ).alias("centroid_id"),
                F.first("__v").alias("__v"),
            )
            mean_col = (
                (
                    F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                )
                if exact_means
                else F.avg("val")
            )
            means = (
                best.select("centroid_id", F.posexplode("__v").alias("pos", "val"))
                .groupBy("centroid_id", "pos")
                .agg(mean_col.alias("m"))
                .collect()
            )
            by_cluster: dict[int, dict[int, float]] = {}
            for r in means:
                by_cluster.setdefault(r["centroid_id"], {})[r["pos"]] = r["m"]
            cents = [
                [by_cluster[i][p] for p in sorted(by_cluster[i])]
                if i in by_cluster
                else cent
                for i, cent in enumerate(cents)
            ]
    finally:
        vecs.unpersist()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(cents)],
        f"{id_col} int, {vec_col} array<double>",
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH top-k: each query also probes every bucket at hamming
    distance 1 from its own (one hyperplane sign flipped).

    Classic recall/cost trade: candidates grow ~(1 + num_planes)x but recall
    approaches exact for vectors near a hyperplane boundary — the standard
    production middle ground between single-probe LSH and brute force. The
    corpus stays single-bucket (the index is unchanged); only the query side
    fans out, so the big side's shuffle is identical to single-probe.
    """
    planes = vectors.hyperplanes(num_planes, dim)
    base = vectors.lsh_bucket(F.col(vec_col), planes)
    probe_buckets = F.array(
        base, *[base.bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(num_planes)]
    )
    q = _normed(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(probe_buckets).alias("bucket"),
        ),
        "q_vec", "q_norm",
    )
    c = _normed(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            vectors.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        ),
        "c_vec", "c_norm",
    )
    # a (query, neighbor) pair can match through several probes — dedupe
    # before ranking so ranks are well-defined. Score FIRST (map-side, on
    # the broadcast join output), then MAX-aggregate per id pair: the
    # dedupe shuffle carries (ids + one double) instead of two dim-wide
    # vectors (~dim x fewer bytes than a distinct over vector rows), and
    # partial aggregation collapses duplicates map-side.
    cand = (
        F.broadcast(q).join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "q_norm", "neighbor_id", "c_vec", "c_norm")
    )
    scored = (
        _with_cosine(cand)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
