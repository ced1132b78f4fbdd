"""Bucketed cross-engine certification above the oracle's memory ceiling.

VERDICT r11 next-step #2: the sf3 spot-check left the document self-join
families "not_checked — DuckDB OOM at 150k docs". This harness certifies
them by splitting each probe's cross-engine digest into per-bucket
partials (plans/registry.py ``digest_frame_bucketed`` /
``digest_sql_bucketed``, pytest-proven lossless + engine-exact at
sf0.01): Spark digests its full result ONCE grouped by a 16-bit
md5-prefix bucket of a key column, while DuckDB evaluates the registered
oracle one bucket at a time — the bucket filter sits over the oracle
body and pushes into the self-join side keyed by that column, so the
quadratic intermediate (pair join, shingle posting join) is held at
1/n_buckets of its whole-query size. n_buckets=1 rows run the plain
whole-query digest for members that are linear-compute but were swept
into the aborted r11 run.

Per-bucket equality of (row_cnt, content_sum) == the same certification
the sf0.01/sf1 contract gives, at a scale the single-node oracle could
not otherwise reach.

Run:  python tools/certify_bucketed.py [sf_dir] [out_json] [--heavy]
      [--only=name1,name2]   (re-run a subset, e.g. after a fixture fix)
      [--nb-mult=K]          (multiply every bucketed target's bucket
                              count by K — at sf10 the same 1/n slice is
                              ~3x the sf3 bytes, so K≈4 keeps each
                              oracle pass inside the memory budget;
                              whole-digest n_buckets=1 rows stay 1)
      [--jobs=J]             (run a target's per-bucket oracle passes on
                              J concurrent DuckDB connections — the
                              passes are independent by construction
                              (fresh connection each, disjoint bucket
                              filters), and DuckDB releases the GIL
                              during execute, so threads give real
                              parallelism. The memory budget is SHARED:
                              each connection gets MEM_LIMIT/J and
                              threads/J cores, so J changes wall-clock,
                              never peak footprint — the knob that
                              closed the sf10 winnowing/simhash gap
                              (VERDICT r13 next-step #2).)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ALL_ORACLE_SQL,
    ALL_QUERIES,
    digest_cols_for,
    digest_frame_bucketed,
    digest_sql_bucketed,
)
from financial_data_ingestion_canonical_snowflake_spark.session import (  # noqa: E402
    get_spark,
)
from tests.oracle_compare import TABLES  # noqa: E402

# (query, bucket_col, n_buckets) — bucket_col keys the heavy self-join
# side for the pair families; n_buckets=1 is the plain whole-digest for
# linear-compute members the aborted r11 sweep never reached.
TARGETS = [
    # pair families (quadratic intermediates, bucketed by id_a)
    ("ns_dedup_minhash_lsh", "id_a", 16),
    ("ns_dedup_simhash", "id_a", 16),
    ("ns_dedup_simhash_adaptive", "id_a", 16),
    ("ns_dedup_ngram_jaccard_capped", "id_a", 16),
    ("ns_dedup_ngram_jaccard_adaptive", "id_a", 16),
    ("ns_dedup_winnowing", "id_a", 16),
    # per-doc / per-key text members (linear, bucketed to bound memory)
    ("ns_text_c4_filters", "doc_id", 8),
    ("ns_text_quality_stats", "doc_id", 8),
    ("ns_text_normalize_scrub", "doc_id", 8),
    ("ns_text_chunking", "doc_id", 8),
    ("ns_text_cdc_chunking", "doc_id", 8),
    ("ns_text_line_dedup", "doc_id", 8),
    ("ns_text_remove_spans", "doc_id", 8),
    ("ns_chunk_dedup", "content_hash", 8),
    ("ns_chunk_dedup_cdc", "content_hash", 8),
    ("ns_text_cooccurrence", "t1", 8),
    ("ns_text_topk_quality_by_lang", "doc_id", 4),
    # curation members
    ("ns_repetition_signals", "doc_id", 8),
    ("ns_importance_weights", "doc_id", 8),
    ("ns_dedup_survivor_policy", "doc_id", 8),
    # small-output / group-level members: whole-digest mode
    ("ns_text_language_id", "lang", 1),
    ("ns_sample_stratified", "lang", 1),
    ("ns_source_mixture", "source", 1),
    ("ns_source_token_divergence", "source", 1),
    ("ns_sample_exact_k", "lang", 1),
    ("ns_dedup_pagerank_fixed", "node", 1),
    ("ns_dedup_graph_stats", "n_nodes", 1),
    ("ns_text_bpe_pairs", "pair", 1),
    # embedding self-join families (quadratic within LSH buckets) — the
    # scale generator injects ~0.2% deterministic near-dup twins
    # (gen_testdata_sf.GEN_TWIN_OFFSET ids), so these rows certify a
    # NON-EMPTY pair set at every generated sf (r12: 0-row agreement)
    ("ns_vector_near_dup", "id_a", 8),
    ("ns_vector_near_dup_adaptive", "id_a", 8),
    # SemDeDup adaptive default: the oracle mirrors the AUTO-ROUTE since
    # r14 (parity_vector.py — flat assignment below
    # HIERARCHICAL_K_THRESHOLD, the sqrt(k) super-quantizer chain at or
    # above it, each branch gated on k), so this row is hash-certifiable
    # at EVERY scale, including sf>=2 where the hierarchical route is the
    # production path (VERDICT r13 Missing #1 closed; the pre-r14
    # CERTIFY_SF3_sem.json "expected divergence" annotation is obsolete).
    ("ns_dedup_semantic_adaptive", "vec_id", 1),
]

# the uncapped exact shingle self-join — the single heaviest oracle;
# opt-in because even 1/64 slices may exceed single-node limits
HEAVY = [("ns_dedup_ngram_jaccard", "id_a", 64)]


MEM_LIMIT = "30GB"  # --mem=NNGB overrides (whole-query oracles — the
# adaptive SemDeDup crossjoin at sf3 — need ~2x the per-bucket budget)
JOBS = 1  # --jobs=J overrides; per-connection memory/threads divide by J
CONN_THREADS = 16


def _per_conn_mem() -> str:
    """Split MEM_LIMIT across JOBS concurrent connections so --jobs never
    raises the sweep's peak footprint, only its wall-clock. Non-GB
    ``--mem`` units (e.g. 30000MB) pass through verbatim at JOBS=1 — the
    pre-jobs behavior — and are rejected loudly when splitting."""
    if JOBS == 1:
        return MEM_LIMIT
    try:
        num = float(MEM_LIMIT.rstrip("GBgb"))
    except ValueError:
        raise SystemExit(
            f"--jobs>1 needs --mem in GB units to split (got {MEM_LIMIT!r})"
        )
    return f"{max(1.0, num / JOBS):g}GB"


def fresh_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{_per_conn_mem()}'")
    con.execute(f"SET threads={max(1, CONN_THREADS // JOBS)}")
    con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='ddb_spill_')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/testdata/sf3"
    out_json = args[1] if len(args) > 1 else "CERTIFY_SF3.json"
    targets = TARGETS + (HEAVY if "--heavy" in sys.argv else [])
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        wanted = set(only[0].split(","))
        targets = [t for t in targets if t[0] in wanted]
    mult = [int(a.split("=", 1)[1]) for a in sys.argv if a.startswith("--nb-mult=")]
    if mult:
        targets = [
            (n, c, nb * mult[0] if nb > 1 else nb) for n, c, nb in targets
        ]
    mem = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--mem=")]
    if mem:
        global MEM_LIMIT
        MEM_LIMIT = mem[0]
    jobs = [int(a.split("=", 1)[1]) for a in sys.argv if a.startswith("--jobs=")]
    if jobs:
        global JOBS
        JOBS = max(1, jobs[0])

    spark = get_spark(app_name="certify-bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    def flush(results):
        # incremental write after every target: a killed/timed-out sweep
        # keeps its completed certifications instead of losing hours of
        # oracle work to an all-or-nothing dump at the end
        n_pass = sum(1 for r in results if r["status"] == "pass")
        out = {
            "sf_dir": sf_dir,
            "method": (
                "per-bucket sub-digests (digest_frame_bucketed/digest_sql_bucketed):"
                " Spark digests the full result grouped by a 16-bit md5-prefix"
                " bucket; DuckDB evaluates the oracle bucket-by-bucket, fresh"
                f" connection per bucket, {JOBS} concurrent passes sharing a"
                f" {MEM_LIMIT} memory budget ({_per_conn_mem()} per connection)"
            ),
            "passed": n_pass,
            "total": len(results),
            "results": results,
        }
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        return n_pass

    results = []
    for name, bucket_col, n_buckets in targets:
        rec = {"query": name, "bucket_col": bucket_col, "n_buckets": n_buckets}
        t0 = time.time()
        try:
            df = ALL_QUERIES[name](spark, sf_dir)
            cols = digest_cols_for(df)
            parts = {
                r.bucket: (r.row_cnt, r.content_sum)
                for r in digest_frame_bucketed(df, bucket_col, n_buckets).collect()
            }
            # the bucket expr is NULL-safe (registry coalesces to the
            # sentinel), so a NULL group here means the mirror broke —
            # fail loudly, those rows would escape every `= k` filter
            if None in parts:
                raise RuntimeError(
                    f"bucket NULL holds {parts[None][0]} rows — NULL-safe "
                    "bucket rendering is broken, rows would escape "
                    "certification"
                )
            rec["spark_rows"] = sum(p[0] for p in parts.values())
            rec["spark_s"] = round(time.time() - t0, 1)
        except Exception as exc:  # noqa: BLE001
            rec["status"] = f"spark_error: {exc}"[:300]
            results.append(rec)
            flush(results)
            print(json.dumps(rec), flush=True)
            continue

        mismatches, ddb_rows, t1 = [], 0, time.time()
        status = "pass"

        def one_bucket(k: int):
            con = fresh_conn(sf_dir)  # fresh per bucket: release memory
            try:
                return con.execute(
                    digest_sql_bucketed(
                        ALL_ORACLE_SQL[name], cols, bucket_col, n_buckets, k
                    )
                ).fetchone()
            finally:
                con.close()

        # per-bucket passes are independent (disjoint bucket filters,
        # fresh connection each); with --jobs=J they run J at a time —
        # DuckDB releases the GIL inside execute, so threads suffice
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(1, JOBS)) as ex:
            futs = {k: ex.submit(one_bucket, k) for k in range(n_buckets)}
            for k in range(n_buckets):
                try:
                    got = futs[k].result()
                except Exception as exc:  # noqa: BLE001
                    status = f"oracle_error@bucket{k}: {exc}"[:300]
                    for f in futs.values():
                        f.cancel()
                    break
                ddb_rows += got[1]
                if (got[1], got[2]) != parts.get(k, (0, 0)):
                    mismatches.append(
                        {"bucket": k, "spark": parts.get(k, (0, 0)), "duckdb": got[1:]}
                    )
        rec["duckdb_s"] = round(time.time() - t1, 1)
        rec["duckdb_rows"] = ddb_rows
        if status == "pass" and mismatches:
            status = "MISMATCH"
            rec["mismatches"] = mismatches
        # defense in depth (ADVICE r12): per-bucket equality implies the
        # totals agree ONLY if every row landed in a compared bucket —
        # a totals gap means rows escaped the bucket partition on one side
        if status == "pass" and rec["spark_rows"] != ddb_rows:
            status = "MISMATCH"
            rec["mismatches"] = [
                {"total_rows": {"spark": rec["spark_rows"], "duckdb": ddb_rows}}
            ]
        rec["status"] = status
        results.append(rec)
        flush(results)
        print(json.dumps(rec), flush=True)

    spark.stop()
    n_pass = flush(results)
    print(f"{n_pass}/{len(results)} pass -> {out_json}")


if __name__ == "__main__":
    main()
