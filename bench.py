"""Benchmark harness: runs the headline parity queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (BENCH_r06 lesson: the driver tail-captures a bounded
window of stdout, and one giant JSON line got its head truncated →
``parsed: null``, so the 2x contract went mechanically unverified):

- first, ONE long JSON line with the full per-query detail
  (min + all repetition timings, table row counts, warm-up failures);
- LAST, ONE short JSON line — guaranteed to fit any tail window —
  {"metric", "value" (total of per-query minimums across the FULL
  surface), "unit", "sf", "n_queries", "queries" (the ~17 headline
  queries only, 2-decimal), "detail": "BENCH_DETAIL.json"}.
- the full detail is also written to BENCH_DETAIL.json at the repo root
  so per-query history survives regardless of capture windows.

Each query is timed N_REPS times (min reported: separates plan cost from
the 1.5x machine-state swing documented in round 6) and forced end-to-end
with the noop sink (full compute, no collect-to-driver bottleneck).
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Timed repetitions per query (min reported). Overridable for quick local
# iteration: SPARK_GRAFT_BENCH_REPS=1 python bench.py
N_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# Elapsed-time budget (seconds, measured from the first timed query): once
# exceeded, remaining queries drop to 1 repetition so a loaded machine
# can't stretch the run past the driver's capture timeout. A full n=3 run
# takes ~7 min idle; the budget only bites under heavy contention, and the
# per-query "runs" arrays in BENCH_DETAIL.json make any clamping visible.
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))

# Host-state calibration marker: a FIXED data-independent CPU workload
# (codegen'd range -> xxhash64 -> bit_xor fold, ~1 s warm on the target
# box) timed at sweep start AND end. Two uses: (a) a swing between the
# two markers attributes mid-sweep host-state drift from the JSON alone
# (the r10 streaming investigation needed a manual 90-min re-run for
# this); (b) a round-over-round shift in the START marker normalizes
# cross-round comparisons for host speed. Row count pinned — changing it
# breaks the cross-round comparability that is the marker's whole point.
CALIBRATION_ROWS = 1_600_000_000

# Reference calibration minimum: the r11 driver sweep's start marker
# (BENCH_r11.json calibration_min[0]) — the quietest recorded host, and
# the anchor every later verdict hand-normalized against (VERDICT r13
# "What's wrong #1"). The headline JSON now carries the ratio and a
# normalized total directly so round-over-round deltas are
# machine-readable. Pinned — moving the anchor silently rescales history.
CALIBRATION_REF_MIN = 0.251


def _calibration_runs(spark, reps: int = 3) -> list[float]:
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (
            spark.range(
                0, CALIBRATION_ROWS, 1, spark.sparkContext.defaultParallelism
            )
            .selectExpr("bit_xor(xxhash64(id)) AS s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


HEADLINE = [
    "a1_pricing_summary",
    "j1_revenue_by_segment",
    "j2_nation_region_rollup",
    "w1_survivor_dedupe",
    "w2_duplicate_counts",
    "u1_union_all_by_source",
    "f8_canonical_id_derivation",
    "v5_json_path_agg",
    "v7_posexplode_outer_lines",
    "m1_merge_upsert",
    "m2_merge_composite_key",
    "anomaly_rules_header_line",
    "stream_tumbling_window_agg",
    "stream_live_windowed_agg",
    "stream_live_scd2",
    "stream_live_interval_join",
    "s7_s8_lineage_rownum",
    "v5b_variant_typed_access",
    "pipeline_e2e_canonical_txn",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from financial_data_ingestion_canonical_snowflake_spark.session import get_spark

    spark = get_spark(app_name="fincan-bench")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.queries()  # populate the registry
    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (
        ALL_QUERIES,
    )

    # Bench the full individual surface (including probes the driver sees
    # only via digest composites) so per-query times stay comparable across
    # rounds; the composite wrappers themselves add no new plans.
    qmap = ALL_QUERIES
    names = [n for n in HEADLINE if n in qmap] + [
        n
        for n in sorted(qmap)
        if n.startswith("ns_")
        and n not in HEADLINE
        and not n.endswith(("_modes", "_digest"))
    ]
    # Targeted re-measurement: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the
    # sweep to the named queries (calibration markers still run, so a
    # quiet-host spot check of a few entries stays host-attributable).
    # The driver never sets this — full sweeps are unaffected.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        wanted = set(only.split(","))
        unknown = wanted - set(names)
        if unknown:
            # a typo'd name must fail loudly, not crash later on an empty
            # sweep (or silently measure less than asked)
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in the bench surface: "
                f"{sorted(unknown)}"
            )
        names = [n for n in names if n in wanted]

    # Warm-up inputs: the smallest sibling SF of the bench dir (falls back
    # to the bench dir itself).
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    # Warm the JVM/codegen once so per-query times measure the plan, not
    # first-run JIT.
    warm = qmap[names[0]](spark, warm_dir)
    warm.write.format("noop").mode("overwrite").save()
    # Also spin up the Arrow/Python worker pool once: the first pandas-UDF
    # query otherwise pays several seconds of per-core worker startup that
    # has nothing to do with its plan (affects the XML reader inside the
    # e2e pipeline and the multimodal kernels).
    def _noop_batches(it):
        yield from it

    (
        spark.range(spark.sparkContext.defaultParallelism)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_noop_batches, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # Warm the timestamp-parquet WRITE path too: the session's first
    # timestamp-bearing parquet write pays ~1.4 s of one-time writer
    # codegen/rebase setup (measured) that would otherwise land inside
    # whichever query writes parquet first (usually pipeline_e2e_*).
    import datetime
    import shutil
    import tempfile

    _warm_dir = tempfile.mkdtemp(prefix="fincan_bench_warm_")
    try:
        spark.createDataFrame(
            [("w", datetime.datetime(2026, 1, 1))], "a string, t timestamp"
        ).write.mode("overwrite").parquet(os.path.join(_warm_dir, "w"))
    finally:
        shutil.rmtree(_warm_dir, ignore_errors=True)

    # Warm-up failures are counted and reported — a silent warm-up no-op
    # would revert every number to the cold-JIT regime while looking
    # identical in the output JSON.
    warmup_failures: list[str] = []
    timings: dict[str, float] = {}
    rep_runs: dict[str, list[float]] = {}
    # Burn-in (VERDICT r14 What's-wrong #2): the host shows a minutes-long
    # slow window right after a sweep launches (start markers 1.76 -> 1.13
    # -> 0.98 while ambient load was 0.07; first-position headline entries
    # absorbed 2-3.5x of pure ramp). Run the calibration workload untimed
    # until BOTH (a) at least SPARK_GRAFT_BENCH_BURNIN_S seconds have
    # elapsed and (b) the marker has flattened (last run no more than 8%
    # faster than the best before it), hard-capped at 3x the budget so a
    # genuinely slow host can't stall the sweep — it just gets recorded as
    # slow by the calibration markers, which is their job. Runs before the
    # first timed query and outside BUDGET_S.
    burnin_budget = float(os.environ.get("SPARK_GRAFT_BENCH_BURNIN_S", "75"))
    burnin_runs: list[float] = []
    bt0 = time.perf_counter()
    while burnin_budget > 0:
        elapsed = time.perf_counter() - bt0
        if elapsed >= 3 * burnin_budget:
            break
        if (
            elapsed >= burnin_budget
            and len(burnin_runs) >= 2
            and burnin_runs[-1] >= 0.92 * min(burnin_runs[:-1])
        ):
            break
        burnin_runs.append(_calibration_runs(spark, reps=1)[0])
    burnin_s = round(time.perf_counter() - bt0, 1)
    # first calibration run doubles as its own warm-up; record all runs
    calibration_start = _calibration_runs(spark)
    bench_t0 = time.perf_counter()
    for qi, name in enumerate(names):
        # Isolate queries from one another (outside the timed region):
        # - clearCache drops frames operators persist() for their own
        #   multi-consumer plans (LSH signatures, shared shingle sets,
        #   Bloom gram universes) so caches don't accumulate across ~60
        #   queries and squeeze execution memory;
        # - gc.collect matters MORE: py4j releases JVM-side DataFrame/
        #   broadcast references only when the Python wrappers are
        #   collected, and CPython's generational GC can lag a whole bench
        #   behind — the pinned broadcasts/plans were measured degrading
        #   late queries 5x (ns_decontaminate_bloom 7.6s -> 39s) until a
        #   forced collection let Spark's ContextCleaner reclaim them.
        # Periodic JVM full GC on top: long single-JVM benches accumulate
        # codegen classes and broadcast blocks whose reclamation otherwise
        # lands INSIDE some later query's timed region (measured: the two
        # heaviest vector queries at 27s/19s mid-bench vs ~5s after a
        # forced collection — outside the timer either way). Every 10th
        # query balances reclamation against full-GC churn.
        spark.catalog.clearCache()
        gc.collect()
        if qi % 10 == 0:
            spark.sparkContext._jvm.System.gc()
        # Per-query warm-up at the smallest SF: compiles/JITs this query's
        # codegen before the timed run, extending the session-level warm-up
        # above to every plan shape. With ~80 distinct plans in one JVM,
        # first-run JIT was measured adding 2-5x on individual queries
        # (e.g. minhash-LSH 6.1s first run vs 1.8s steady-state) — the
        # timed number should measure the PLAN at sf0.1, which is what
        # scales to a cluster, not single-shot JIT latency.
        # With N_REPS >= 2 the warm-up is REDUNDANT (rep 1 absorbs JIT and
        # the reported min ignores it) — skipping it keeps total bench
        # wall-time at ~3 executions per query instead of 4.
        # EXCEPTION: the pipeline_e2e_* family memoizes its fixture run per
        # session (parity_pipeline._run_pipeline) — a warm-up call would
        # consume the real run and the timed call would only re-read the
        # warehouse. Those stay cold: their first run IS the measurement.
        # Repetitions: the e2e pipeline family memoizes its fixture run per
        # session, so only its FIRST run measures anything — it stays n=1.
        over_budget = time.perf_counter() - bench_t0 > BUDGET_S
        reps = 1 if name.startswith("pipeline_e2e") or over_budget else N_REPS
        # The two live streaming-drain probes are the highest-variance
        # entries in the sweep (a first execution carries stream-harness
        # startup that decays 2-3x by the next run — docs/BENCH_NOTES.md
        # r14 subset-mode caveat) and they sort late, where the budget
        # clamp routinely pins them to that cold single shot (r15: 28.5 s
        # clamped vs 13.7 s warm for the same drain). Floor them at 2
        # reps — bounded extra (~45 s) — so the reported min reflects the
        # steady-state regime the probe exists to regression-track.
        if N_REPS >= 2 and name in (
            "ns_stream_live_sinks",
            "ns_stream_rebucket_drain",
        ):
            reps = max(reps, 2)
        # Whenever only ONE timed run will happen (REPS=1 mode, or the
        # budget clamp), restore the sf0.001 warm-up so that single number
        # is still a warm measurement — a clamped query must not silently
        # report the cold-JIT time this warm-up regime exists to exclude.
        if reps < 2 and not name.startswith("pipeline_e2e"):
            try:
                qmap[name](spark, warm_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:
                warmup_failures.append(name)  # best-effort, but visible
        runs: list[float] = []
        for _ in range(reps):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        rep_runs[name] = runs
    calibration_end = _calibration_runs(spark)

    # Per-table row counts: the driver regenerates testdata between rounds
    # (documents/embeddings/events sizes have changed before), which shifts
    # per-query times for data reasons. Recording the input sizes next to
    # the timings makes data drift separable from code regressions.
    table_rows = {}
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        try:
            table_rows[t] = spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        except Exception:
            table_rows[t] = None

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Host-speed ratio vs the pinned r11 anchor, from the START marker
    # (the round-over-round convention; end_min exposes mid-sweep drift
    # separately). Guarded: a degenerate marker must not zero a divisor.
    # clamped AFTER rounding — a degenerate sub-millisecond marker would
    # otherwise round the ratio to 0.0 and zero the normalization divisor
    cal_ratio = max(
        round(max(min(calibration_start), 1e-6) / CALIBRATION_REF_MIN, 3),
        0.001,
    )
    # conservative variant: the FASTEST marker either side of the sweep.
    # On a host whose start marker no longer converges in 3 reps (r14:
    # start_runs [1.76, 1.13, 0.98] at ambient load 0.07 while the end
    # marker read 0.319) the start-only ratio overstates host slowness
    # and over-normalizes; the best marker is the closest observable to
    # true host capability (docs/BENCH_NOTES.md r14).
    cal_ratio_best = max(
        round(
            max(min(calibration_start + calibration_end), 1e-6)
            / CALIBRATION_REF_MIN,
            3,
        ),
        0.001,
    )
    detail = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_reps": N_REPS,
        # per-round investigation notes live in docs/BENCH_NOTES.md; the
        # pointer rides in the detail JSON so a reader of the numbers
        # finds the explanations (r10: streaming-drain swing root cause)
        "notes": "docs/BENCH_NOTES.md",
        "queries": timings,
        # medians alongside minima: a query whose median drifts while its
        # min holds is seeing host contention, not plan regression
        "medians": {
            n: round(statistics.median(r), 3) for n, r in rep_runs.items()
        },
        "runs": rep_runs,
        # fixed-workload host-state markers (docs/BENCH_NOTES.md r11):
        # start vs end swing = mid-sweep drift, machine-attributable
        # without a manual re-run
        "calibration": {
            "rows": CALIBRATION_ROWS,
            # untimed post-JVM-start ramp absorber (VERDICT r14 #2): the
            # start markers below are taken AFTER this flattened
            "burnin_runs": burnin_runs,
            "burnin_s": burnin_s,
            "start_runs": calibration_start,
            "end_runs": calibration_end,
            "start_min": min(calibration_start),
            "end_min": min(calibration_end),
            "ref_min": CALIBRATION_REF_MIN,
            "ratio_vs_r11": cal_ratio,
            "ratio_vs_r11_best": cal_ratio_best,
        },
        # host-normalized per-query minima (min / ratio_vs_r11): a query
        # whose RAW time moved with the calibration marker is host drift;
        # one whose NORMALIZED time moved is a plan change
        "queries_normalized": {
            n: round(t / cal_ratio, 3) for n, t in timings.items()
        },
        "warmup_failures": warmup_failures,
        "table_rows": table_rows,
        "sf": sf_val,
    }
    # Persist + print the long detail FIRST (it may exceed the driver's
    # tail-capture window; that's fine — the short line below is last).
    # Subset runs (BENCH_ONLY) print but do NOT persist: a 2-query spot
    # check must not clobber the committed full-sweep detail history.
    if not only:
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_DETAIL.json"),
                "w",
            ) as fh:
                json.dump(detail, fh, indent=1, sort_keys=True)
        except OSError:
            pass
    print(json.dumps(detail))
    # The LAST line is the driver-parsed one: short by construction — the
    # "queries" dict carries only the ~17 headline queries so the whole
    # line stays well under any plausible tail window even as the full
    # surface grows.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 2),
                # normalized totals LEAD, directly beside raw (VERDICT r14
                # What's-wrong #1: the raw number alone reads as a
                # regression on a slow host window) — raw / (marker /
                # r11 anchor 0.251); _best uses the fastest marker of the
                # sweep and is the one to compare across rounds when the
                # two markers disagree (docs/BENCH_NOTES.md r14)
                "value_cal_normalized": round(
                    sum(timings.values()) / cal_ratio, 2
                ),
                "value_cal_normalized_best": round(
                    sum(timings.values()) / cal_ratio_best, 2
                ),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "n_warmup_failures": len(warmup_failures),
                "calibration_min": [
                    min(calibration_start),
                    min(calibration_end),
                ],
                "calibration_ratio_vs_r11": cal_ratio,
                "calibration_ratio_vs_r11_best": cal_ratio_best,
                "burnin_s": burnin_s,
                "queries": {
                    n: round(timings[n], 2) for n in HEADLINE if n in timings
                },
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
