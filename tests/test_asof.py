"""As-of join semantics on crafted frames (operators/asof.py): exact-match
inclusion/exclusion, equal-timestamp tiebreak, tolerance nulling, no-match
nulls, and multi-column keys. The sf-scale oracle parity lives in
plans/parity_asof.py; these pin the corner cases the synthetic events
table never hits."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 0, 0, s)


def _frames(spark):
    probe = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(5)), (2, 102, _ts(10)), (3, 103, _ts(10))],
        "k long, pid long, pts timestamp",
    )
    build = spark.createDataFrame(
        [
            (1, 900, 1.0, _ts(10)),  # exact tie with probe 100
            (1, 901, 2.0, _ts(10)),  # same ts — larger bid must win
            (1, 902, 3.0, _ts(1)),
            (2, 903, 4.0, _ts(3)),
        ],
        "k long, bid long, bval double, bts timestamp",
    )
    return probe, build


def _run(spark, **kw):
    probe, build = _frames(spark)
    out = asof_join(
        probe,
        build,
        on=["k"],
        probe_ts="pts",
        build_ts="bts",
        build_cols=["bid", "bval"],
        build_order="bid",
        **kw,
    )
    return {r.pid: (r.bid, r.bval) for r in out.collect()}

def test_asof_exact_match_tiebreak_and_nulls(spark):
    got = _run(spark)
    assert got == {
        100: (901, 2.0),  # equal-ts build included; largest bid wins the tie
        101: (902, 3.0),
        102: (903, 4.0),
        103: (None, None),  # key never seen on build side
    }


def test_asof_exclude_exact_matches(spark):
    got = _run(spark, allow_exact_matches=False)
    assert got[100] == (902, 3.0)  # equal-ts builds skipped, falls back to t=1
    assert got[101] == (902, 3.0)


def test_asof_tolerance_nulls_stale_matches(spark):
    got = _run(spark, tolerance=F.expr("INTERVAL 5 SECONDS"))
    assert got == {
        100: (901, 2.0),   # age 0 — kept
        101: (902, 3.0),   # age 4s <= 5s — kept
        102: (None, None), # age 7s > 5s — nulled
        103: (None, None),
    }


def test_asof_composite_key(spark):
    probe = spark.createDataFrame(
        [(1, "a", 10, _ts(9)), (1, "b", 11, _ts(9))],
        "k1 long, k2 string, pid long, pts timestamp",
    )
    build = spark.createDataFrame(
        [(1, "a", 90, _ts(2)), (1, "b", 91, _ts(3)), (2, "a", 92, _ts(1))],
        "k1 long, k2 string, bid long, bts timestamp",
    )
    out = asof_join(
        probe, build, on=["k1", "k2"], probe_ts="pts", build_ts="bts", build_cols=["bid"]
    )
    assert {r.pid: r.bid for r in out.collect()} == {10: 90, 11: 91}


def test_asof_single_shuffle_plan(spark):
    """The whole as-of join is ONE exchange (on the key) — no join operator,
    no second shuffle; that's the property that makes it linear at scale."""
    probe, build = _frames(spark)
    out = asof_join(
        probe, build, on=["k"], probe_ts="pts", build_ts="bts", build_cols=["bid"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_interval_join_matches_naive_and_avoids_nested_loop(spark):
    """Binned rewrite == naive BETWEEN join, with a hash join (no
    BroadcastNestedLoop/Cartesian) in the plan."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.interval_join import (
        interval_join,
    )

    probe = spark.createDataFrame(
        [(1, i, _ts(i)) for i in range(0, 50, 3)], "k long, pid long, pts timestamp"
    )
    iv = spark.createDataFrame(
        [(1, 10, _ts(2), _ts(11)), (1, 11, _ts(11), _ts(30)), (2, 12, _ts(0), _ts(59))],
        "k long, ivid long, s timestamp, e timestamp",
    )
    out = interval_join(probe, iv, on=["k"], probe_ts="pts", start_col="s", end_col="e",
                        bin_seconds=5)
    got = sorted((r.pid, r.ivid) for r in out.collect())
    want = sorted(
        (r.pid, r.ivid)
        for r in probe.join(iv, "k")
        .filter((F.col("pts") >= F.col("s")) & (F.col("pts") <= F.col("e")))
        .collect()
    )
    assert got == want and len(got) > 0
    # pre-window probe excluded; end-boundary probe (pts == e) included
    assert (0, 10) not in got and (30, 11) in got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_forward_direction(spark):
    """direction='forward': earliest build >= probe; equal-ts ties go to the
    SMALLEST build_order; exact matches excludable."""
    got = _run(spark, direction="forward")
    # probe 100 @10: builds at 10 (bid 900, 901) -> smallest bid wins
    assert got[100] == (900, 1.0)
    # probe 101 @5: next build at 10 -> smallest bid at that ts
    assert got[101] == (900, 1.0)
    # probe 102 (k=2) @10: only build @3 is in the past -> no forward match
    assert got[102] == (None, None)
    # no exact matches: probe 100 skips ts=10 builds, nothing later
    strict = _run(spark, direction="forward", allow_exact_matches=False)
    assert strict[100] == (None, None)


def test_asof_forward_tolerance(spark):
    got = _run(spark, direction="forward", tolerance=F.expr("INTERVAL 2 SECONDS"))
    # probe 101 @5 -> next build @10 is 5s away, outside 2s tolerance
    assert got[101] == (None, None)
    # probe 100 @10 -> build @10, 0s away, inside
    assert got[100] == (900, 1.0)


def test_asof_nearest_direction(spark):
    """direction='nearest': closer side wins; distance ties -> backward."""
    probe = spark.createDataFrame(
        [(1, 200, _ts(6)), (1, 201, _ts(2)), (1, 202, _ts(30))],
        "k long, pid long, pts timestamp",
    )
    build = spark.createDataFrame(
        [(1, 910, 1.0, _ts(4)), (1, 911, 2.0, _ts(8))],
        "k long, bid long, bval double, bts timestamp",
    )
    out = asof_join(
        probe, build, on=["k"], probe_ts="pts", build_ts="bts",
        build_cols=["bid", "bval"], build_order="bid", direction="nearest",
    )
    got = {r.pid: r.bid for r in out.collect()}
    assert got[200] == 910  # equidistant (2s both ways) -> backward wins
    assert got[201] == 910  # only forward... @4 is 2s forward; no backward -> forward
    assert got[202] == 911  # far future probe -> nearest is latest backward


def test_asof_nearest_microsecond_precision(spark):
    """Distances compare as EXACT unix_micros longs: at 2026 epochs a
    double-cast (epoch seconds) has ~0.4us ulp, so a 1us difference — and
    the backward-wins rule on a true tie — must not be lost (ADVICE r2)."""
    base = dt.datetime(2026, 6, 1, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    probe = spark.createDataFrame(
        [(1, 300, base), (1, 301, base + 10 * us)],
        "k long, pid long, pts timestamp",
    )
    build = spark.createDataFrame(
        [
            (1, 920, base - 2 * us),   # 2us behind probe 300
            (1, 921, base + 1 * us),   # 1us ahead of probe 300 -> closer
            (1, 922, base + 21 * us),  # 11us ahead of probe 301
            # probe 301: backward 921 is 9us behind; forward 922 is 11us ahead
        ],
        "k long, bid long, bts timestamp",
    )
    out = asof_join(
        probe, build, on=["k"], probe_ts="pts", build_ts="bts",
        build_cols=["bid"], build_order="bid", direction="nearest",
    )
    got = {r.pid: r.bid for r in out.collect()}
    assert got[300] == 921  # 1us forward beats 2us backward
    assert got[301] == 921  # 9us backward beats 11us forward


def test_asof_nearest_true_tie_goes_backward_at_us_scale(spark):
    base = dt.datetime(2026, 6, 1, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    probe = spark.createDataFrame([(1, 310, base)], "k long, pid long, pts timestamp")
    build = spark.createDataFrame(
        [(1, 930, base - 3 * us), (1, 931, base + 3 * us)],
        "k long, bid long, bts timestamp",
    )
    out = asof_join(
        probe, build, on=["k"], probe_ts="pts", build_ts="bts",
        build_cols=["bid"], build_order="bid", direction="nearest",
    )
    assert out.collect()[0].bid == 930  # exact tie -> backward (pandas parity)
