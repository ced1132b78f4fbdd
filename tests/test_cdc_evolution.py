"""snapshot_diff (generation CDC feed) and merge_upsert schema evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.operators.merge import (
    merge_upsert,
    snapshot_diff,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.storage import (
    ParquetTable,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import ALL_QUERIES


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, amount double")


def test_snapshot_diff_classifies_changes(spark):
    old = _snap(spark, [(1, "A", 10.0), (2, "B", 20.0), (3, "C", None), (4, None, 40.0)])
    new = _snap(spark, [(1, "A", 10.0), (2, "B", 25.0), (4, None, 40.0), (5, "E", 50.0)])
    got = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == {2, 3, 5}
    assert got[2]["change_type"] == "update" and got[2]["amount"] == 25.0
    assert got[3]["change_type"] == "delete" and got[3]["status"] == "C"
    assert got[5]["change_type"] == "insert" and got[5]["amount"] == 50.0
    # NULL == NULL is "unchanged" (null-safe compare): k=4 emits nothing


def test_snapshot_diff_merge_round_trip(spark, sf_oracle):
    """Applying the diff to the old snapshot reproduces the new one:
    upserts via merge_upsert, deletes via anti-join."""
    from financial_data_ingestion_canonical_snowflake_spark.plans.parity_relational import (
        cdc_orders_scenario,
    )
    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import table

    o = table(spark, sf_oracle, "orders")
    new = cdc_orders_scenario(o)  # the SAME scenario the registered query diffs
    diff = snapshot_diff(o, new, ["o_orderkey"]).persist()
    upserts = diff.filter(F.col("change_type") != "delete").drop("change_type")
    deletes = diff.filter(F.col("change_type") == "delete").select("o_orderkey")
    rebuilt = merge_upsert(o, upserts, ["o_orderkey"]).join(
        deletes, "o_orderkey", "left_anti"
    )
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0
    diff.unpersist()


def test_snapshot_diff_between_generations(spark, tmp_path):
    """read_generation + snapshot_diff = the change feed between retained
    table generations."""
    t = ParquetTable(str(tmp_path / "dim"), keep_generations=2)
    t.overwrite_atomic(_snap(spark, [(1, "A", 1.0), (2, "B", 2.0)]))
    t.overwrite_atomic(_snap(spark, [(1, "A", 1.5), (3, "C", 3.0)]))
    feed = snapshot_diff(
        t.read_generation(spark, 1), t.read(spark), ["k"]
    )
    got = {r["k"]: r["change_type"] for r in feed.collect()}
    assert got == {1: "update", 2: "delete", 3: "insert"}


def test_snapshot_diff_single_join(spark):
    old = _snap(spark, [(1, "A", 10.0)])
    new = _snap(spark, [(1, "A", 11.0)])
    plan = (
        snapshot_diff(old, new, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Join") == 1  # one full-outer join, predicate map-side


def test_registered_cdc_query_runs(spark, sf_oracle):
    df = ALL_QUERIES["ns_snapshot_diff_cdc"](spark, sf_oracle)
    counts = {r["change_type"]: r["n"] for r in
              df.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"insert", "update", "delete"}
    assert all(v > 0 for v in counts.values())


# ------------------------------------------------------------- evolution


def test_evolve_schema_appends_and_preserves(spark):
    target = _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)])
    source = spark.createDataFrame(
        [(2, "B2", "eu"), (3, "C", "us")], "k long, status string, region string"
    )  # no amount column; new region column
    out = merge_upsert(target, source, ["k"], evolve_schema=True)
    got = {r["k"]: r for r in out.collect()}
    assert set(out.columns) == {"k", "status", "amount", "region"}
    # matched row: source speaks to status, stays silent on amount
    assert got[2]["status"] == "B2" and got[2]["amount"] == 20.0
    assert got[2]["region"] == "eu"
    # untouched target row: typed NULL for the appended column
    assert got[1]["amount"] == 10.0 and got[1]["region"] is None
    # inserted row: NULL for the column the source doesn't have
    assert got[3]["amount"] is None and got[3]["region"] == "us"


def test_evolve_schema_rejects_type_conflicts_and_missing_keys(spark):
    target = _snap(spark, [(1, "A", 10.0)])
    conflict = spark.createDataFrame([(1, 5, 1.0)], "k long, status int, amount double")
    with pytest.raises(ValueError, match="type conflicts"):
        merge_upsert(target, conflict, ["k"], evolve_schema=True)
    keyless = spark.createDataFrame([("A",)], "status string")
    with pytest.raises(ValueError, match="merge keys"):
        merge_upsert(target, keyless, ["k"], evolve_schema=True)
    # case-mismatched names would silently null real data through the
    # case-insensitive withColumn path — rejected up front
    cased = spark.createDataFrame([(1, "B")], "k long, Status string")
    with pytest.raises(ValueError, match="case-conflicting"):
        merge_upsert(target, cased, ["k"], evolve_schema=True)


def test_snapshot_diff_rejects_reserved_column(spark):
    df = spark.createDataFrame([(1, "x")], "k long, change_type string")
    with pytest.raises(AssertionError, match="change_type"):
        snapshot_diff(df, df, ["k"])
