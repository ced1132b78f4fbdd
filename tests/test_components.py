"""connected_components (operators/components.py) vs a driver-side
union-find oracle on adversarial graph shapes: seeded random graphs, a
long path (worst case for naive propagation), duplicate/reversed edges,
and singleton handling."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
    connected_components,
)


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    label = {}
    for v in range(n_nodes):
        r = find(v)
        label[r] = min(label.get(r, r), v)
    return {v: label[find(v)] for v in range(n_nodes)}


def _spark_cc(spark, n_nodes, pairs):
    edges = spark.createDataFrame(pairs or [(0, 0)], "src long, dst long")
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    out = connected_components(edges, nodes=nodes)
    return {r.node: r.component for r in out.collect()}


def test_cc_random_graphs_match_union_find(spark):
    for seed, n, m in [(1, 40, 30), (2, 60, 80), (3, 25, 12)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        assert _spark_cc(spark, n, pairs) == _union_find(n, pairs), f"seed={seed}"


def test_cc_long_path_converges_logarithmically(spark):
    # A 64-node path: naive min-propagation needs 63 rounds; star-contraction
    # must finish within the operator's max_iter=25 (O(log n)).
    from financial_data_ingestion_canonical_snowflake_spark.operators import (
        components as C,
    )

    pairs = [(i, i + 1) for i in range(63)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    nodes = spark.range(64).select(F.col("id").alias("node"))
    stats: dict = {}
    out = connected_components(edges, nodes=nodes, stats=stats)
    got = {r.node: r.component for r in out.collect()}
    assert got == {v: 0 for v in range(64)}
    # observed rounds via the per-call stats channel, and logarithmic:
    # well under the naive 63; the module global stays as an alias
    assert 1 <= stats["rounds"] <= 10
    assert C.LAST_CC_ROUNDS == stats["rounds"]


def test_cc_max_iter_cap_trips_loudly_on_pathological_budget(spark):
    # An under-sized round budget must raise — NOT return half-merged
    # labels (which would silently corrupt downstream dedupe decisions).
    import pytest

    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        connected_components,
    )

    pairs = [(i, i + 1) for i in range(255)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint in 1 rounds"):
        connected_components(edges, max_iter=1).collect()
    # the same graph converges with the default budget
    out = connected_components(edges)
    assert out.agg(F.countDistinct("component")).collect()[0][0] == 1


def test_cc_duplicate_and_reversed_edges(spark):
    pairs = [(5, 3), (3, 5), (5, 3), (3, 3), (8, 9)]
    got = _spark_cc(spark, 10, pairs)
    assert got[3] == got[5] == 3 and got[8] == got[9] == 8
    assert got[0] == 0 and got[7] == 7  # untouched singletons


def test_cc_without_nodes_frame_only_edge_nodes(spark):
    edges = spark.createDataFrame([(2, 1), (3, 2), (7, 9)], "src long, dst long")
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_graph_stats_known_graph(spark):
    """Hand-verified stats on a triangle with a pendant edge, including
    duplicate/reversed/self-loop inputs being canonicalized away."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        graph_stats,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (4, 3), (5, 5)],
        ["src", "dst"],
    )
    row = graph_stats(edges).collect()[0]
    # canonical edges: {1-2, 2-3, 1-3, 3-4}; degrees 1:2, 2:2, 3:3, 4:1
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 4
    assert row["max_degree"] == 3
    assert row["n_wedges"] == 1 + 1 + 3 + 0
    assert row["n_triangles"] == 1


def test_pagerank_matches_python_reference(spark):
    """pagerank == a pure-Python power iteration to 1e-9, on a graph with
    a sink (dangling node), a hub, and an isolated-pair component."""
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (4, 1), (5, 6)]
    # node 6 is a sink (no out-edges): dangling mass redistributes
    df = spark.createDataFrame(edges, ["src", "dst"])
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        pagerank,
    )

    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=12).collect()}

    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    pr = {v: 1.0 / n for v in nodes}
    damping = 0.85
    for _ in range(12):
        dangling = sum(pr[v] for v in nodes if v not in out)
        nxt = {v: (1 - damping) / n + damping * dangling / n for v in nodes}
        for s, ds in out.items():
            for d in ds:
                nxt[d] += damping * pr[s] / len(ds)
        pr = nxt
    assert set(got) == set(pr)
    for v in nodes:
        assert abs(got[v] - pr[v]) < 1e-9, (v, got[v], pr[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty_graph(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        pagerank,
    )

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, n_iter=3).count() == 0


def test_component_survivors_quality_policy(spark):
    """Highest score survives per component; ties break to the lowest id;
    singletons survive themselves; exactly one survivor per component."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        component_survivors,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "node long, component long",
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5), (8, 4), (9, 0)],
        "doc_id long, score long",
    )
    rows = {r.doc_id: r for r in component_survivors(comp, scores).collect()}
    assert len(rows) == 6
    # component 1: scores 10/30/30 -> tie between 2 and 3 -> lowest id 2
    assert rows[1].survivor_id == 2 and not rows[1].is_kept
    assert rows[2].is_kept and rows[3].survivor_id == 2 and not rows[3].is_kept
    # component 7: 7 beats 8
    assert rows[7].is_kept and not rows[8].is_kept
    # singleton survives itself
    assert rows[9].is_kept and rows[9].survivor_id == 9
    # exactly one survivor per component
    kept = [r for r in rows.values() if r.is_kept]
    assert sorted(r.component_id for r in kept) == [1, 7, 9]


# ------------------------------------------------------- property (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_H = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_H
@given(
    st.lists(  # (node, component, score) with components forming any grouping
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-10, max_value=10),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_component_survivors_invariants(spark, rows):
    """For ANY component labeling and score table: every input node comes
    back exactly once; exactly one survivor per component; the survivor
    maximizes (score, -id) within its component."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        component_survivors,
    )

    comp = spark.createDataFrame(
        [(n, c) for n, c, _ in rows], "node long, component long"
    )
    scores = spark.createDataFrame(
        [(n, s) for n, _, s in rows], "doc_id long, score long"
    )
    out = component_survivors(comp, scores).collect()
    assert sorted(r.doc_id for r in out) == sorted(n for n, _, _ in rows)
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r.component_id, []).append(r)
    want_surv = {}
    for n, c, s in rows:
        cur = want_surv.get(c)
        if cur is None or (s, -n) > (cur[1], -cur[0]):
            want_surv[c] = (n, s)
    for c, members in by_comp.items():
        kept = [r for r in members if r.is_kept]
        assert len(kept) == 1
        assert kept[0].doc_id == want_surv[c][0]
        assert all(r.survivor_id == want_surv[c][0] for r in members)


def test_component_survivors_string_ids_and_missing_scores(spark):
    """Round-7 review fixes pinned: string ids tie-break to the LOWEST id
    deterministically (a negated-id shortcut would NULL out), and nodes
    with no score row are preserved with NULL score, losing to any scored
    member; an all-unscored component falls back to lowest id."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        component_survivors,
    )

    comp = spark.createDataFrame(
        [("docB", 1), ("docA", 1), ("docC", 1), ("x1", 2), ("x2", 2)],
        "node string, component long",
    )
    scores = spark.createDataFrame(
        [("docA", 30), ("docB", 30)],  # docC unscored; component 2 unscored
        "doc_id string, score long",
    )
    rows = {r.doc_id: r for r in component_survivors(comp, scores).collect()}
    assert set(rows) == {"docA", "docB", "docC", "x1", "x2"}  # nobody vanishes
    assert rows["docA"].is_kept          # tie 30/30 -> lowest string id
    assert not rows["docB"].is_kept
    assert rows["docC"].score is None and not rows["docC"].is_kept
    assert rows["x1"].is_kept and not rows["x2"].is_kept  # all-unscored


def test_pagerank_fixed_point_tracks_float_and_is_deterministic(spark):
    """The integer micro-unit variant must track the float power method to
    floor-leak precision (each round floors per-edge contributions: worst
    drift << 1e-6 relative on this graph) and reproduce bit-identically
    across runs — the property that makes it hash-certifiable when the
    float twin is rows-only."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        pagerank,
        pagerank_fixed_point,
    )

    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (4, 1), (5, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fl = {r["node"]: r["rank"] for r in pagerank(df, n_iter=3).collect()}
    fx = {
        r["node"]: r["rank_units"]
        for r in pagerank_fixed_point(df, n_iter=3).collect()
    }
    assert set(fx) == set(fl)
    for v, units in fx.items():
        assert abs(units / 1e12 - fl[v]) < 1e-6, (v, units, fl[v])
    fx2 = {
        r["node"]: r["rank_units"]
        for r in pagerank_fixed_point(df, n_iter=3).collect()
    }
    assert fx == fx2  # integer arithmetic: exact rerun equality


def test_pagerank_fixed_point_empty_graph(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        pagerank_fixed_point,
    )

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank_fixed_point(df, n_iter=2).count() == 0


@_H
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=14,
    ),
    n_iter=st.integers(1, 3),
)
def test_pagerank_fixed_point_matches_python_reference(spark, edges, n_iter):
    """Bit-exact against a pure-Python integer power method on arbitrary
    graphs (hubs, sinks, multi-edges) — the determinism claim behind the
    hash-certified probe, proven per round count."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.components import (
        pagerank_fixed_point,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank_fixed_point(df, n_iter=n_iter).collect()
    }

    SCALE, D_NUM, D_DEN = 10**12, 85, 100
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    base = ((D_DEN - D_NUM) * SCALE // D_DEN) // n
    r = {v: SCALE // n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r[v] for v in nodes if v not in out)
        s_in = {v: 0 for v in nodes}
        for s, ds in out.items():
            c = r[s] // len(ds)
            for d in ds:
                s_in[d] += c
        r = {
            v: base + (D_NUM * (s_in[v] + dangling // n)) // D_DEN
            for v in nodes
        }
    assert got == r
