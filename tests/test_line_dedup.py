"""frequent_line_removal (corpus-level boilerplate-line dedup) + the two
new relational windows (SCD2 build, time-range rolling agg): value
invariants and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.operators.text_dedup import (
    frequent_line_removal,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import ALL_QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    # 4 docs; "footer" appears in all 4 (boilerplate), "menu" in 3,
    # content lines are unique. doc 4 is pure boilerplate.
    rows = [
        (1, ["alpha beta", "Footer", "menu"]),
        (2, ["gamma delta", "footer  ", "menu"]),
        (3, ["epsilon", "FOOTER", "menu"]),
        (4, ["footer"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


def test_frequent_line_removal_drops_boilerplate_keeps_order(spark):
    out = frequent_line_removal(
        _docs(spark), "doc_id", "lines", max_doc_freq=2
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 4  # every input doc has a row, even all-dropped
    # footer (normalized: lower+trim, 4 docs) and menu (3 docs) exceed 2
    assert got[1]["kept_text"] == "alpha beta"
    assert got[2]["kept_text"] == "gamma delta"
    assert got[3]["kept_text"] == "epsilon"
    assert got[4]["kept_text"] == "" and got[4]["n_kept"] == 0
    assert got[4]["n_lines"] == 1 and got[4]["n_dropped"] == 1
    for d in (1, 2, 3):
        assert got[d]["n_lines"] == 3
        assert got[d]["n_kept"] == 1 and got[d]["n_dropped"] == 2


def test_frequent_line_removal_order_survives_multiline(spark):
    rows = [(1, [f"line {i}" for i in range(20)])]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = frequent_line_removal(df, "doc_id", "lines", max_doc_freq=5)
    [r] = out.collect()
    # nothing crosses the doc-frequency cap with one doc -> identity, in order
    assert r["kept_text"] == "\n".join(f"line {i}" for i in range(20))
    assert r["n_dropped"] == 0


def test_frequent_line_removal_null_lines_and_null_array(spark):
    rows = [
        (1, ["keep me", None]),
        (2, [None, "also kept"]),
        (3, [None]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    # NULL elements normalize to "" -> doc-frequency 3 > cap -> dropped
    out = {r["doc_id"]: r for r in
           frequent_line_removal(df, "doc_id", "lines", max_doc_freq=2).collect()}
    assert out[1]["kept_text"] == "keep me" and out[1]["n_kept"] == 1
    assert out[2]["kept_text"] == "also kept" and out[2]["n_dropped"] == 1
    assert out[3]["n_lines"] == 1 and out[3]["n_kept"] == 0
    assert out[4]["n_lines"] == 0 and out[4]["kept_text"] == ""
    # under a high cap the NULL line is KEPT as an empty line (counts and
    # text agree: array_join would have silently dropped a NULL element)
    high = {r["doc_id"]: r for r in
            frequent_line_removal(df, "doc_id", "lines", max_doc_freq=10).collect()}
    assert high[1]["n_kept"] == 2 and high[1]["kept_text"] == "keep me\n"
    assert high[3]["n_kept"] == 1 and high[3]["kept_text"] == ""


def test_frequent_line_removal_plan_broadcasts_drop_set(spark):
    plan = _plan(
        frequent_line_removal(_docs(spark), "doc_id", "lines", max_doc_freq=2)
    )
    # drop set applies as a broadcast LEFT ANTI (map-side), never a
    # corpus-wide shuffled anti-join
    import re

    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan)
    assert not re.search(r"SortMergeJoin .*LeftAnti", plan)


def test_scd2_versions_partition_event_stream(spark, sf_oracle):
    out = ALL_QUERIES["ns_scd2_dimension"](spark, sf_oracle)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_current").alias("cur"),
        F.count_distinct("user_id").alias("users"),
    ).collect()[0]
    # exactly one open (is_current) version per user
    assert agg["cur"] == agg["users"]
    # versions are dense 1..k per user and eff ranges chain: eff_to of
    # version v equals eff_from of v+1
    chained = (
        out.alias("a")
        .join(
            out.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.version_n") + 1 == F.col("b.version_n")),
        )
        .filter(F.col("a.eff_to_us") != F.col("b.eff_from_us"))
        .count()
    )
    assert chained == 0


def test_rolling_range_agg_window_is_trailing(spark, sf_oracle):
    out = ALL_QUERIES["ns_rolling_range_agg"](spark, sf_oracle)
    # every event counts itself -> cnt >= 1; and the trailing-hour count
    # can never exceed the user's total event count
    totals = out.groupBy("user_id").agg(
        F.max("cnt_1h").alias("max_cnt"), F.count(F.lit(1)).alias("n")
    )
    assert totals.filter(F.col("max_cnt") > F.col("n")).count() == 0
    assert out.filter(F.col("cnt_1h") < 1).count() == 0


def test_scd2_single_exchange(spark, sf_oracle):
    plan = _plan(ALL_QUERIES["ns_scd2_dimension"](spark, sf_oracle))
    # both window passes share one (user_id) hash exchange
    assert plan.count("Exchange hashpartitioning(user_id") == 1
