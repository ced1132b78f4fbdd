"""Column-profiling operator (operators/profiling.py): value checks on a
fixture with NULLs, approx-mode sanity, and the one-pass plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.profiling import (
    profile_columns,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 10.0),
            (3, "b", 20.0),
            (4, None, 20.0),
        ],
        ["id", "s", "v"],
    )


def test_profile_exact_values(spark):
    out = {r["col_name"]: r for r in profile_columns(_fixture(spark), exact=True).collect()}
    assert set(out) == {"id", "s", "v"}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 4
    assert (out["id"]["min_value"], out["id"]["max_value"]) == ("1", "4")
    assert out["s"]["n_nonnull"] == 3 and out["s"]["n_nulls"] == 1
    assert out["s"]["null_frac"] == 0.25
    assert out["s"]["n_distinct"] == 2  # NULL excluded
    assert out["v"]["n_distinct"] == 2
    assert out["v"]["min_value"] == "10.0"


def test_profile_approx_mode_and_subset(spark):
    out = {
        r["col_name"]: r
        for r in profile_columns(_fixture(spark), columns=["id"]).collect()
    }
    assert set(out) == {"id"}
    # HLL++ is exact at this cardinality
    assert out["id"]["n_distinct"] == 4


def test_profile_is_one_aggregate_pass(spark):
    df = _fixture(spark)
    plan = (
        profile_columns(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # approx mode: exactly one partial+final aggregate pair over the input,
    # no Expand replication (a refactor into chained aggregations adds
    # aggregate nodes and fails here)
    assert "Expand" not in plan, plan
    n_aggs = plan.count("HashAggregate") + plan.count("SortAggregate") + plan.count("ObjectHashAggregate")
    assert n_aggs <= 2, plan
    # exact mode plans through Expand (documented n_cols x replication)
    plan_exact = (
        profile_columns(df, exact=True)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in plan_exact, plan_exact
