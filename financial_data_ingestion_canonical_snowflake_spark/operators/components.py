"""Connected components over a pair list — dedup-group closure.

Near-duplicate detectors (operators/text_dedup.py) emit PAIRS; dedup
survivorship needs GROUPS (a~b and b~c must collapse a,b,c to one
canonical doc even when a~c was never scored). That closure is connected
components on the pair graph.

Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round is
two groupBy+join passes that strictly shrink tree heights, converging in
O(log n) rounds even on path graphs, vs O(diameter) for naive label
propagation. Every round is plain shuffles on node ids; the convergence
digest rides the round's own checkpoint job as an observed metric
(``observe`` + eager ``localCheckpoint`` — no separate per-round
action), and the checkpoint truncates lineage so the plan stays flat
at 100 TB. The reference
engine has no graph operator at all; its exact-dup survivorship
(sql/03_transform_headers.sql:70-80) is the single-edge special case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected pair set, oriented (larger -> smaller), self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checkpoint_with_signature(edges: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
    """Materialize one round (eager localCheckpoint) and compute its
    convergence digest with a direct 1-row aggregate OVER THE CHECKPOINTED
    partitions (reads materialized blocks — milliseconds).

    Deliberately NOT ``observe``/CollectMetrics fused into the checkpoint
    job: ``Observation.get`` blocks on the listener bus, and in a busy
    session (a bench or driver run tens of queries deep) the async event
    queue lags far behind job completion — measured as the whole closure
    spiking 7s -> 23s with the observe variant while the plain per-round
    agg stayed flat. A tiny deterministic extra job beats a fast path
    gated on event-bus latency.

    The digest is an xor-fold (order-insensitive, cannot overflow under
    ANSI) of row hashes plus the row count; it changes iff the edge set
    changed, which is the fixpoint test."""
    df = edges.localCheckpoint(eager=True)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).first()
    return df, (row["n"], row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every LARGER neighbor to min(N(u) + {u})."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", "src").alias("m"))
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every SMALLER-or-self neighbor to min(N(u))."""
    o = _canon(edges)
    m = o.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (
        o.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    return moved.unionByName(m.select("src", F.col("m").alias("dst")))


def graph_stats(edges: DataFrame) -> DataFrame:
    """Structural stats of an undirected pair graph in one row:
    ``(n_nodes, n_edges, max_degree, n_wedges, n_triangles)`` — the
    shape report for a near-duplicate graph (a boilerplate-heavy corpus
    shows up as few nodes with huge degree; triangle density separates
    tight duplicate clusters from chains).

    All integers, so the result is engine-exact. Triangles count via the
    standard edge-iterator join on (a<b<c)-oriented edges: E(a,b) ⋈
    E(b,c) ⋈ E(a,c) — two equi-joins that hash-partition cleanly; wedges
    are Σ d(d−1)/2 over the degree table. At heavy skew (celebrity
    nodes), orient edges low-degree→high-degree before the join (the
    classic refinement) — the id-orientation here matches the oracle
    exactly and is fine below that regime.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # The oriented edge set feeds FIVE consumers (degree table, edge
        # count, and all three triangle-join branches); without
        # materialization each consumer recomputes the whole upstream
        # candidate-pair plan — measured 17.5s -> ~4s at sf0.1 on the
        # near-dup graph. The edge set is pairs-sized (small); blocks are
        # reclaimed by the ContextCleaner when the frame is collected.
        .localCheckpoint(eager=True)
    )
    sym = e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
    deg = sym.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    deg_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("d").cast("long").alias("max_degree"),
        F.sum((F.col("d") * (F.col("d") - 1)) / F.lit(2))
        .cast("long")
        .alias("n_wedges"),
    )
    edge_cnt = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    tri = (
        e.alias("e1")
        .join(
            e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2"), "b"
        )
        .join(
            e.select(F.col("a"), F.col("b").alias("c")).alias("e3"), ["a", "c"]
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        deg_stats.crossJoin(edge_cnt)
        .crossJoin(tri)
        .select("n_nodes", "n_edges", "max_degree", "n_wedges", "n_triangles")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst) — fixed-iteration
    power method (Page et al. 1999; the standard distributed formulation).

    Per round: contributions = ranks ⋈ edges on src (rank/out_degree to
    each dst), new rank = (1-d)/N + d·(Σ contribs + dangling_mass/N),
    where dangling mass (rank parked on sink nodes) redistributes
    uniformly so total rank stays 1. ONE join + one groupBy per round,
    both hash-partitioned on node id; out-degrees pre-join the edge list
    once; an eager ``localCheckpoint`` every ``checkpoint_every`` rounds
    keeps the plan flat. The dangling-mass aggregate rides each round's
    plan as a broadcast scalar (crossJoin of a 1-row frame) — rounds
    BETWEEN checkpoints schedule no Spark action at all.

    Float caveat: shuffle-order of the contribution sum makes low-order
    bits run-dependent; exactness vs a Python reference is proven to 1e-9
    in tests (rows-only verification, like every iterative trainer here).

    Returns (node, rank); ranks sum to 1 over the node set.
    """
    # The edge list is consumed 1 + 2*n_iter times (degree aggregate +
    # contribution join per round) and often arrives as an EXPENSIVE plan
    # (e.g. a near-dup candidate join); an eager localCheckpoint runs that
    # plan exactly once AND truncates it from every round's analysis.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        nodes.unpersist()
        return out
    # Static per-round inputs, built ONCE: edges pre-joined with the
    # source's out-degree (so each round needs a single rank join), and
    # the sink-node set (dangling-mass detection without re-deriving
    # degrees per round).
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_w = (
        edges.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    sinks = nodes.join(
        edges_w.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    # Sink-free fast path (r15): a graph where every node has out-degree
    # >= 1 — ALWAYS true for the symmetrized near-dup pair graphs this
    # engine feeds it — has identically zero dangling mass, so the
    # per-round sink semi-join + 1-row aggregate + broadcast (a full
    # ranks pass each round at scale) is pure waste. One bounded
    # existence probe decides it up front; adding an exact 0.0 never
    # changes an IEEE sum of positive ranks, so results are
    # bit-identical (pinned vs the Python reference in tests).
    has_sinks = not sinks.isEmpty()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for r in range(n_iter):
        # rank parked on sinks redistributes uniformly; the 1-row
        # aggregate rides the round's plan as a broadcast scalar, so
        # rounds BETWEEN checkpoints schedule no Spark action at all —
        # n_iter rounds cost ~n_iter/checkpoint_every actions
        dangling = (
            ranks.join(sinks, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
        ) if has_sinks else None
        summed = (
            ranks.join(edges_w, ranks.node == edges_w.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        joined = nodes.join(summed, "node", "left")
        if has_sinks:
            joined = joined.crossJoin(F.broadcast(dangling))
            contrib = F.coalesce(F.col("s"), F.lit(0.0)) + F.col(
                "__dangling"
            ) / F.lit(float(n))
        else:
            contrib = F.coalesce(F.col("s"), F.lit(0.0))
        ranks = joined.select(
            "node",
            (F.lit(base) + F.lit(damping) * contrib).alias("rank"),
        )
        if (r + 1) % checkpoint_every == 0 or r + 1 == n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    # the final eager checkpoint materialized ranks — the loop-state
    # caches can release their executor storage now
    nodes.unpersist()
    sinks.unpersist()
    return ranks


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 10**12,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank in fixed-point INTEGER micro-units — the hash-certifiable
    twin of :func:`pagerank`.

    The float power method is rows-only forever: shuffle order perturbs
    the contribution sum's low bits, so no cross-engine oracle can pin it.
    This variant carries rank as ``rank_units`` (BIGINT, ``scale`` units
    = total mass) and replaces every float op with exact integer
    arithmetic — contributions ``rank div out_deg``, damping as the
    rational ``d_num/d_den`` via ``(d_num * s) div d_den`` — so the
    result is bit-identical on ANY engine and ANY execution order (both
    Spark's ``div`` and DuckDB's ``//`` floor non-negative integers
    identically; every intermediate stays far under 2^63). Each round's
    floor operations leak at most ``out_deg`` units per node — a 1e-12
    relative deviation from the float method per round, proven ~1e-9
    against it in tests.

    Same scale shape as :func:`pagerank`: out-degrees pre-join the edge
    list once, one rank join + one node-keyed aggregate per round,
    dangling mass as a broadcast 1-row scalar, eager checkpoints keep the
    plan flat. Returns ``(node, rank_units)``.
    """
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.withColumn(
            "rank_units", F.lit(0).cast("long")
        ).localCheckpoint(eager=True)
        nodes.unpersist()
        return out
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_w = (
        edges.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    sinks = nodes.join(
        edges_w.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    # exact Python-int preamble, mirrored verbatim by the oracle
    base = ((d_den - d_num) * scale // d_den) // n
    # sink-free fast path — see :func:`pagerank`. Integer twin: the skipped
    # term is exactly ``0 div n = 0``, so every ``rank_units`` is the same
    # BIGINT either way and the hash certification is unaffected.
    has_sinks = not sinks.isEmpty()
    ranks = nodes.withColumn("rank_units", F.lit(scale // n).cast("long"))
    for r in range(n_iter):
        dangling = (
            ranks.join(sinks, "node", "left_semi")
            .agg(
                F.coalesce(F.sum("rank_units"), F.lit(0))
                .cast("long")
                .alias("__dangling")
            )
        ) if has_sinks else None
        summed = (
            ranks.join(edges_w, ranks.node == edges_w.src)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_units div out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        joined = nodes.join(summed, "node", "left")
        if has_sinks:
            joined = joined.crossJoin(F.broadcast(dangling))
            step = (
                f"({d_num} * (coalesce(s, cast(0 as bigint))"
                f" + (__dangling div {n}))) div {d_den}"
            )
        else:
            step = f"({d_num} * coalesce(s, cast(0 as bigint))) div {d_den}"
        ranks = joined.select(
            "node",
            (F.lit(base) + F.expr(step)).cast("long").alias("rank_units"),
        )
        if (r + 1) % checkpoint_every == 0 or r + 1 == n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    sinks.unpersist()
    return ranks


# Diagnostic: rounds the last connected_components call needed to reach
# its fixpoint (including the confirming round). Large-star/small-star
# contracts in O(log n) rounds, so this staying far below max_iter is the
# scale-health signal the 8x smoke asserts; a value AT max_iter never
# happens — the operator raises instead of returning unconverged labels.
LAST_CC_ROUNDS: int = 0


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Component label (= min node id in the component) per node.

    ``edges``: columns (src, dst), undirected, any orientation/dups.
    ``nodes``: optional (node) frame; nodes absent from every edge come
    back as singleton components of themselves.
    Returns (node, component).

    ``max_iter`` is the loud-failure bound: star-contraction needs
    O(log n) rounds (25 covers any graph that fits on hardware — 2^25
    contraction doublings), so hitting the cap means the input is
    pathological or the contraction is broken, and silently returning
    HALF-MERGED component labels would corrupt every downstream dedupe
    decision. The observed round count is written into the caller's
    ``stats`` dict (``stats["rounds"]``) when one is passed — the
    race-free per-call channel — and also published as the module-level
    ``LAST_CC_ROUNDS`` convenience alias, which concurrent callers can
    clobber (cap-trip + round-count behavior pinned in
    tests/test_components.py; the 8x scale smoke records it).
    """
    global LAST_CC_ROUNDS
    cur, sig = _checkpoint_with_signature(_canon(edges))
    for r in range(max_iter):
        nxt, nsig = _checkpoint_with_signature(_canon(_small_star(_large_star(cur))))
        cur = nxt
        if nsig == sig:
            LAST_CC_ROUNDS = r + 1
            if stats is not None:
                stats["rounds"] = r + 1
            break
        sig = nsig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # At the fixpoint the edge set is a star forest: (member -> component min).
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    assign = (
        members.unionByName(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    if nodes is None:
        return assign
    return (
        nodes.select("node")
        .distinct()
        .join(assign, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def component_survivors(
    comp: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection over dedup components: per
    connected component, keep the HIGHEST-``score_col`` member (ties to
    the lowest id) instead of the naive lowest-id survivor — the
    production near-dup policy (among a cluster of near-duplicates you
    keep the longest / cleanest / highest-quality copy, not whichever
    happened to get the smallest id).

    ``comp``: ``(node, component)`` from :func:`connected_components`;
    ``scores``: ``(id_col, score_col)``. Returns
    ``(id_col, component_id, score, survivor_id, is_kept)``.

    Score semantics: scores attach via LEFT join, so a node missing a
    score row stays in the output (with NULL score) rather than silently
    vanishing; unscored members lose to any scored member, and an
    all-unscored component falls back to the lowest id. The tie-break
    orders ``(score DESC NULLS LAST, id ASC)`` via max-then-min
    aggregates, which works for ANY orderable id type (a negated-id
    max_by shortcut would NULL out on string ids).

    Scale shape: one equi-join attaches scores (shuffle on the id); the
    best-score and survivor-id aggregates are map-side-combinable and
    component-keyed (one row per component through each exchange); the
    joins back are against component-count-sized frames. No step is ever
    quadratic in cluster width.
    """
    j = comp.join(scores, comp["node"] == scores[id_col], "left").select(
        comp["node"].alias(id_col),
        F.col("component").alias("component_id"),
        F.col(score_col).alias("score"),
    )
    # ``j`` feeds THREE consumers (best-score agg, survivor pick, final
    # join) — without a persist each consumer re-evaluates the score join
    # AND the caller's full ``scores`` lineage (measured: the survivor
    # query re-scanned its document source 3x, plans/r15/
    # ns_dedup_survivor_policy_before.txt). Corpus-compact rows (id,
    # component, score); cache lifetime contract as elsewhere — the
    # session owner clears between query families.
    j = j.persist()
    best = j.groupBy("component_id").agg(F.max("score").alias("__best"))
    surv = (
        j.join(best, "component_id")
        # null-safe: an all-unscored component has __best NULL and every
        # member ties (NULL <=> NULL), so min(id) picks the survivor
        .filter(F.col("score").eqNullSafe(F.col("__best")))
        .groupBy("component_id")
        .agg(F.min(id_col).alias("survivor_id"))
    )
    return j.join(surv, "component_id").select(
        id_col,
        "component_id",
        "score",
        "survivor_id",
        (F.col(id_col) == F.col("survivor_id")).alias("is_kept"),
    )
