"""sf10 certification of the graph-closure families via a pair-list-fed
external reference (VERDICT r14 next-step #2).

The three closure probes — ``ns_dedup_survivor_policy``,
``ns_dedup_pagerank_fixed``, ``ns_dedup_graph_stats`` — could not be
certified at sf10 by the DuckDB oracle: their twins embed the global
connected-components closure (a recursive min-label walk) or the full
pair self-join, which is un-bucketable and exceeded single-node capacity
(>77 GB spill, ``CERTIFY_SF10_text2.json``). But the closure INPUT — the
candidate pair set — IS hash-certified at sf10 (``ns_dedup_minhash_lsh``
and ``ns_dedup_ngram_jaccard_capped`` in ``CERTIFY_SF10.json``), so the
remaining question is only whether the graph algorithms over that pair
set are right at scale.

Method (the ``tests/test_components.py`` discipline, applied at sf10):

1. Spark computes the SAME pair sets the registered queries consume
   (capped n-gram Jaccard for survivor/graph-stats, MinHash-LSH for
   fixed-point PageRank) and collects them — the pair lists are
   hundreds-to-thousands of rows, driver-small by construction.
2. A pure-Python single-pass reference (union-find with min-label
   components / exact integer fixed-point power method / adjacency-set
   triangle counting) recomputes each family's full result from the
   collected pairs + independently derived per-doc scores (``len(text)``
   computed in Python from the raw text, NOT Spark's length).
3. The Spark query's full output is collected and compared row-exact
   (sorted tuples) against the reference. All outputs are
   integer/boolean, so equality is exact — the same bar as the
   hash-certifications, via an external reference instead of SQL.

Run:  python tools/certify_closure_sf10.py [sf_dir] [out_json]
      (defaults: /tmp/testdata/sf10 CERTIFY_SF10_closure.json)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

entrymod.queries()  # populate the registry

from pyspark.sql import functions as F  # noqa: E402

from financial_data_ingestion_canonical_snowflake_spark.operators import (  # noqa: E402
    text_dedup as td,
)
from financial_data_ingestion_canonical_snowflake_spark.plans import (  # noqa: E402
    parity_text as pt,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ALL_QUERIES,
)
from financial_data_ingestion_canonical_snowflake_spark.session import (  # noqa: E402
    get_spark,
)


# ---------------- pure-Python references ----------------


class UnionFind:
    """Path-halving union-by-attachment union-find; component label is
    resolved afterwards as the MIN member id (matching
    connected_components' min-label contract)."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        while p.get(x, x) != x:
            p[x] = p.get(p[x], p[x])
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # attach larger root under smaller: keeps min reachable and
            # bounds depth well enough at pair-list scale
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def ref_components(pairs, all_nodes):
    """(node -> component) with component = min id of the component;
    nodes absent from every pair are singleton components."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # resolve min label per root over pair-touched nodes
    root_min: dict[int, int] = {}
    touched = set()
    for a, b in pairs:
        touched.add(a)
        touched.add(b)
    for n in touched:
        r = uf.find(n)
        if r not in root_min or n < root_min[r]:
            root_min[r] = n
    comp = {}
    for n in all_nodes:
        comp[n] = root_min[uf.find(n)] if n in touched else n
    return comp


def ref_survivors(comp, scores):
    """(doc_id, component_id, score, survivor_id, is_kept) rows per the
    component_survivors policy: max score wins, ties to lowest id."""
    best: dict[int, tuple] = {}
    for n, c in comp.items():
        s = scores[n]
        key = (-s, n)
        if c not in best or key < best[c]:
            best[c] = key
    surv = {c: k[1] for c, k in best.items()}
    return sorted(
        (n, c, scores[n], surv[c], n == surv[c]) for n, c in comp.items()
    )


def ref_pagerank_fixed(pairs, n_iter=3, d_num=85, d_den=100, scale=10**12):
    """Exact integer fixed-point PageRank over the symmetrized pair
    graph — replicates pagerank_fixed_point's arithmetic with Python
    ints (floor division throughout)."""
    edges = []
    for a, b in pairs:
        edges.append((a, b))
        edges.append((b, a))
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    if n == 0:
        return []
    out_deg: dict[int, int] = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    base = ((d_den - d_num) * scale // d_den) // n
    r = {v: scale // n for v in nodes}
    srcs = set(out_deg)
    for _ in range(n_iter):
        dangling = sum(r[v] for v in nodes if v not in srcs)
        s: dict[int, int] = {v: 0 for v in nodes}
        for src, dst in edges:
            s[dst] += r[src] // out_deg[src]
        r = {
            v: base + (d_num * (s[v] + dangling // n)) // d_den
            for v in nodes
        }
    return sorted(r.items())


def ref_graph_stats(pairs):
    """(n_nodes, n_edges, max_degree, n_wedges, n_triangles) over the
    deduped (a<b)-oriented edge set — adjacency-set triangle count
    equivalent to the edge-iterator join on a<b<c orientation."""
    e = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg: dict[int, int] = {}
    adj_gt: dict[int, set] = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj_gt.setdefault(a, set()).add(b)
    n_nodes = len(deg)
    n_edges = len(e)
    max_degree = max(deg.values()) if deg else None
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    n_triangles = 0
    for a, b in e:
        n_triangles += len(adj_gt.get(a, set()) & adj_gt.get(b, set()))
    return (n_nodes, n_edges, max_degree, n_wedges, n_triangles)


# ---------------- harness ----------------


def _pair_fingerprint(pairs) -> str:
    h = hashlib.sha256()
    for a, b in sorted(pairs):
        h.update(f"{a},{b};".encode())
    return h.hexdigest()[:16]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/testdata/sf10"
    out_json = args[1] if len(args) > 1 else "CERTIFY_SF10_closure.json"

    spark = get_spark(app_name="certify-closure")
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    def flush():
        n_pass = sum(1 for r in results if r["status"] == "pass")
        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "method": (
                        "pair-list-fed external reference: Spark computes the"
                        " sf10-hash-certified candidate pair sets"
                        " (CERTIFY_SF10.json: ns_dedup_minhash_lsh /"
                        " ns_dedup_ngram_jaccard_capped families), a pure-Python"
                        " union-find / integer-fixed-point / adjacency-set"
                        " reference recomputes each closure family from the"
                        " collected pairs with independently derived scores"
                        " (Python len(text)), and the Spark query's full output"
                        " is compared row-exact"
                    ),
                    "passed": n_pass,
                    "total": len(results),
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )

    docs2 = pt._docs2(spark, sf_dir)

    # ---- shared inputs ----
    t0 = time.time()
    jacc_pairs = [
        (r.id_a, r.id_b)
        for r in td.ngram_jaccard_pairs(
            docs2, "doc_id", "text",
            shingle_len=3, min_jaccard=0.6, max_shingle_freq=5,
        )
        .select("id_a", "id_b")
        .collect()
    ]
    lsh_pairs = [
        (r.id_a, r.id_b)
        for r in td.minhash_lsh_pairs(
            docs2, "doc_id", "text",
            num_hashes=pt.NUM_HASHES, bands=pt.BANDS, min_matching=8,
        )
        .select("id_a", "id_b")
        .collect()
    ]
    # independent scores: Python len() over the raw text, streamed so the
    # corpus never sits on the driver whole
    scores: dict[int, int] = {}
    for row in docs2.select("doc_id", "text").toLocalIterator():
        scores[row.doc_id] = len(row.text)
    inputs_s = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "inputs": {
                    "jacc_pairs": len(jacc_pairs),
                    "jacc_fp": _pair_fingerprint(jacc_pairs),
                    "lsh_pairs": len(lsh_pairs),
                    "lsh_fp": _pair_fingerprint(lsh_pairs),
                    "n_docs": len(scores),
                    "seconds": inputs_s,
                }
            }
        ),
        flush=True,
    )

    # ---- ns_dedup_survivor_policy ----
    rec = {"query": "ns_dedup_survivor_policy", "pairs": len(jacc_pairs)}
    t0 = time.time()
    try:
        got = sorted(
            (r.doc_id, r.component_id, r.score, r.survivor_id, r.is_kept)
            for r in ALL_QUERIES["ns_dedup_survivor_policy"](
                spark, sf_dir
            ).collect()
        )
        comp = ref_components(jacc_pairs, scores.keys())
        want = ref_survivors(comp, scores)
        rec["spark_rows"] = len(got)
        rec["ref_rows"] = len(want)
        if got == want:
            rec["status"] = "pass"
        else:
            diff = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
            rec["status"] = "mismatch"
            rec["first_diffs"] = [
                {"got": got[i], "want": want[i]} for i in diff[:3]
            ]
    except Exception as exc:  # noqa: BLE001
        rec["status"] = f"error: {exc}"[:300]
    rec["seconds"] = round(time.time() - t0, 1)
    results.append(rec)
    flush()
    print(json.dumps(rec, default=str), flush=True)

    # ---- ns_dedup_pagerank_fixed ----
    rec = {"query": "ns_dedup_pagerank_fixed", "pairs": len(lsh_pairs)}
    t0 = time.time()
    try:
        got = sorted(
            (r.node, r.rank_units)
            for r in ALL_QUERIES["ns_dedup_pagerank_fixed"](
                spark, sf_dir
            ).collect()
        )
        want = ref_pagerank_fixed(lsh_pairs)
        rec["spark_rows"] = len(got)
        rec["ref_rows"] = len(want)
        if got == want:
            rec["status"] = "pass"
        else:
            diff = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
            rec["status"] = "mismatch"
            rec["first_diffs"] = [
                {"got": got[i], "want": want[i]} for i in diff[:3]
            ]
    except Exception as exc:  # noqa: BLE001
        rec["status"] = f"error: {exc}"[:300]
    rec["seconds"] = round(time.time() - t0, 1)
    results.append(rec)
    flush()
    print(json.dumps(rec, default=str), flush=True)

    # ---- ns_dedup_graph_stats ----
    rec = {"query": "ns_dedup_graph_stats", "pairs": len(jacc_pairs)}
    t0 = time.time()
    try:
        rows = ALL_QUERIES["ns_dedup_graph_stats"](spark, sf_dir).collect()
        got = tuple(rows[0]) if rows else None
        want = ref_graph_stats(jacc_pairs)
        rec["spark"] = list(got) if got else None
        rec["ref"] = list(want)
        rec["status"] = "pass" if got == want else "mismatch"
    except Exception as exc:  # noqa: BLE001
        rec["status"] = f"error: {exc}"[:300]
    rec["seconds"] = round(time.time() - t0, 1)
    results.append(rec)
    flush()
    print(json.dumps(rec, default=str), flush=True)


if __name__ == "__main__":
    main()
