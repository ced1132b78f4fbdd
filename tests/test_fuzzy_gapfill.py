"""Unit tests for the blocked fuzzy-match join (operators/fuzzy.py) and
forward-fill gap filling (operators/gapfill.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.fuzzy import (
    blocked_fuzzy_pairs,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.gapfill import (
    gap_fill_ffill,
)

_HOUR_US = 3_600_000_000


def _fuzzy_df(spark):
    rows = [
        (1, "red widget"),
        (2, "rad widget"),      # dist 1 from red widget
        (3, "blue widget"),     # dist >2 from both
        (4, "red gizmo"),       # other block
        (5, "red gizmos"),      # blocked apart from 4 (last word differs)
        (6, None),              # NULL name -> NULL block, never matches
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_blocks_and_distance(spark):
    pairs = blocked_fuzzy_pairs(
        _fuzzy_df(spark), "id", "name",
        F.element_at(F.split(F.col("name"), " "), -1),
        max_distance=2,
    ).collect()
    got = {(r.id_a, r.id_b): r.distance for r in pairs}
    # only the widget block has a close pair; cross-block near-misses
    # ("red gizmo"/"red gizmos") are invisible by design
    assert got == {(1, 2): 1}


def test_fuzzy_block_width_cap(spark):
    df = spark.createDataFrame(
        [(i, f"name {i % 2}") for i in range(10)], "id long, name string"
    )
    # all rows share one block (last token "0"/"1" -> two blocks of 5)
    capped = blocked_fuzzy_pairs(
        df, "id", "name", F.element_at(F.split(F.col("name"), " "), -1),
        max_distance=0, max_block_width=4,
    )
    assert capped.count() == 0  # both blocks wider than cap -> dropped
    uncapped = blocked_fuzzy_pairs(
        df, "id", "name", F.element_at(F.split(F.col("name"), " "), -1),
        max_distance=0,
    )
    # 5 identical names per block -> C(5,2) pairs each
    assert uncapped.count() == 20


def test_fuzzy_degenerate_block_capped(spark):
    """10k identical names share one block — the |block|² hole (~50M
    candidate pairs) that max_block_width exists to close, mirroring
    tests/test_similarity.py's 10k-identical-docs LSH-cap test. With the
    cap the degenerate block is dropped entirely (zero pairs from it,
    bounded work); clean blocks under the cap are unaffected."""
    rows = [(i, "degenerate common name") for i in range(10_000)]
    rows += [(20_000, "rare widget"), (20_001, "race widget")]  # dist 1
    df = spark.createDataFrame(rows, "id long, name string")
    block = F.element_at(F.split(F.col("name"), " "), -1)
    capped = blocked_fuzzy_pairs(
        df, "id", "name", block, max_distance=2, max_block_width=1000
    ).collect()
    got = {(r.id_a, r.id_b): r.distance for r in capped}
    assert got == {(20_000, 20_001): 1}
    # cap wider than every block -> identical to uncapped on a small slice
    small = spark.createDataFrame(rows[:50] + rows[-2:], "id long, name string")
    with_cap = blocked_fuzzy_pairs(
        small, "id", "name", block, max_distance=2, max_block_width=1000
    )
    without = blocked_fuzzy_pairs(small, "id", "name", block, max_distance=2)
    assert sorted(map(tuple, with_cap.collect())) == sorted(
        map(tuple, without.collect())
    )


def _events_df(spark):
    # one key, observations in hours 0, 1, and 4 (gap of 2 buckets);
    # hour 1 has two observations — later (ts, order) wins
    rows = [
        (10, 0, 1, 1.0),
        (10, _HOUR_US + 5, 2, 2.0),
        (10, _HOUR_US + 5, 3, 2.5),   # same ts, higher order -> survivor
        (10, 4 * _HOUR_US, 4, 4.0),
        (None, 2 * _HOUR_US, 5, 9.9),  # NULL key dropped
    ]
    df = spark.createDataFrame(rows, "k long, us long, o long, v double")
    return df.select("k", F.timestamp_micros("us").alias("ts"), "o", "v")


def test_gap_fill_runs_and_survivorship(spark):
    out = gap_fill_ffill(
        _events_df(spark), "k", "ts", "v", "o", step_seconds=3600
    ).collect()
    rows = {r.bucket_us: (r.value, r.is_observed) for r in out}
    assert len(out) == 5  # hours 0..4 inclusive, no extrapolation past 4
    assert rows[0] == (1.0, True)
    assert rows[_HOUR_US] == (2.5, True)          # in-bucket survivor by (ts, o)
    assert rows[2 * _HOUR_US] == (2.5, False)     # filled forward
    assert rows[3 * _HOUR_US] == (2.5, False)
    assert rows[4 * _HOUR_US] == (4.0, True)
    assert all(r.key == 10 for r in out)


def test_gap_fill_single_observation_key(spark):
    df = spark.createDataFrame(
        [(1, 7 * _HOUR_US, 1, 3.3)], "k long, us long, o long, v double"
    ).select("k", F.timestamp_micros("us").alias("ts"), "o", "v")
    out = gap_fill_ffill(df, "k", "ts", "v", "o", step_seconds=3600).collect()
    assert len(out) == 1 and out[0].is_observed and out[0].value == 3.3


# ------------------------------------------------------- property (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_H = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_obs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=20),     # bucket index
        st.integers(min_value=0, max_value=5),      # order tiebreak
        st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=25,
)


@_H
@given(_obs)
def test_gap_fill_matches_python_reference(spark, obs):
    # collapse exact (k, bucket, order) collisions first (last drawn wins)
    # — the operator's (ts, order) tiebreak is only deterministic when the
    # tiebreak key is unique, which real event streams guarantee via ids
    uniq = {}
    for k, b, o, v in obs:
        uniq[(k, b, o)] = float(v)
    rows = [
        (k, b * _HOUR_US + o, o, v)  # distinct ts per (bucket, order)
        for (k, b, o), v in uniq.items()
    ]
    df = spark.createDataFrame(
        rows or [(None, None, None, None)],
        "k long, us long, o long, v double",
    ).filter(F.col("k").isNotNull()).select(
        "k", F.timestamp_micros("us").alias("ts"), "o", "v"
    )
    got = {
        (r.key, r.bucket_us): (r.value, r.is_observed)
        for r in gap_fill_ffill(
            df, "k", "ts", "v", "o", step_seconds=3600
        ).collect()
    }

    # python reference: per key, last (ts, o) per bucket wins; forward fill
    # between consecutive observed buckets
    per_key: dict[int, dict[int, tuple]] = {}
    for (k, b, o), v in uniq.items():
        cur = per_key.setdefault(k, {})
        ts = b * _HOUR_US + o
        if b not in cur or (ts, o) > cur[b][:2]:
            cur[b] = (ts, o, v)
    want = {}
    for k, buckets in per_key.items():
        bs = sorted(buckets)
        for i, b in enumerate(bs):
            end = bs[i + 1] - 1 if i + 1 < len(bs) else b
            for fill in range(b, end + 1):
                want[(k, fill * _HOUR_US)] = (
                    buckets[b][2], fill == b
                )
    # float32 hypothesis values round-trip exactly through double
    assert got == want


@_H
@given(st.lists(st.sampled_from(
    ["good line here ok yes.", "bad", "no punct line words here",
     "slow line with words here.", ""]), min_size=0, max_size=12))
def test_c4_counters_partition_lines(spark, lines):
    from financial_data_ingestion_canonical_snowflake_spark.functions.text import (
        c4_line_filters,
    )

    df = spark.createDataFrame([(1, lines)], "doc_id long, lines array<string>")
    stats = c4_line_filters(F.col("lines"), min_words=4, blocklist=("slow",))
    row = df.select(
        F.size(stats["kept_lines"]).alias("kept"),
        stats["n_lines"].alias("n"),
        stats["n_short"].alias("s"),
        stats["n_nopunct"].alias("p"),
        stats["n_blocklist"].alias("b"),
    ).first()
    assert row.n == len(lines)
    assert row.n == row.kept + row.s + row.p + row.b


def test_expectations_counts_and_null_semantics(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.expectations import (
        check_expectations,
    )

    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, None, -1.0), (None, "X", None), (1, "F", 5.0)],
        "k long, s string, v double",
    )
    rep = {
        r.rule: r
        for r in check_expectations(
            df,
            rules=[
                ("k_not_null", F.col("k").isNotNull()),
                ("s_accepted", F.col("s").isin("O", "F")),
                ("v_positive", F.col("v") > 0),
            ],
            unique_keys=[("k_unique", ["k"])],
        ).collect()
    }
    assert all(r.n_rows == 4 for r in rep.values())
    assert rep["k_not_null"].n_violations == 1
    # NULL membership/comparison counts as violation, not a pass
    assert rep["s_accepted"].n_violations == 2
    assert rep["v_positive"].n_violations == 2
    # k values: 1, 2, NULL, 1 -> 3 distinct (NULL is a key value) -> 1 surplus
    assert rep["k_unique"].n_violations == 1
    assert not rep["k_unique"].passed
