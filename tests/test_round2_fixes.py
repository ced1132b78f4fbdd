"""Round-2 polish: durable OPS views, interval-join guards, multiprobe dedupe.

Covers VERDICT r1 next-steps #5/#6/#8 and the ADVICE interval_join row.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.examples import write_fixtures
from financial_data_ingestion_canonical_snowflake_spark.operators.interval_join import interval_join
from financial_data_ingestion_canonical_snowflake_spark.plans.pipeline import Pipeline, PipelineConfig

TS = dt.datetime


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, start_ts timestamp, end_ts timestamp, tag string")


def _probe(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp")


def test_interval_join_rejects_ambiguous_columns(spark):
    probe = spark.createDataFrame([("a", TS(2026, 1, 1), "x")], "k string, ts timestamp, tag string")
    ivs = _iv(spark, [("a", TS(2026, 1, 1), TS(2026, 1, 2), "y")])
    with pytest.raises(ValueError, match="ambiguous.*tag"):
        interval_join(probe, ivs, on=["k"], probe_ts="ts", start_col="start_ts", end_col="end_ts")


def test_interval_join_drops_inverted_intervals(spark):
    # end < start matches nothing under BETWEEN; it must not blow up the
    # bin explode with a descending sequence either
    probe = _probe(spark, [("a", TS(2026, 1, 1, 6))])
    ivs = _iv(
        spark,
        [
            ("a", TS(2026, 1, 1, 0), TS(2026, 1, 1, 12), "good"),
            ("a", TS(2026, 1, 2, 0), TS(2026, 1, 1, 0), "inverted"),
        ],
    )
    out = interval_join(probe, ivs, on=["k"], probe_ts="ts", start_col="start_ts", end_col="end_ts")
    assert [r.tag for r in out.collect()] == ["good"]


def test_durable_views_registered(spark, tmp_path):
    root = write_fixtures(str(tmp_path / "ingest"))
    cfg = PipelineConfig(
        ingest_root=root,
        warehouse=str(tmp_path / "wh"),
        batch_ts=TS(2026, 2, 1, 12, 0, 0),
        durable_views=True,
    )
    pipe = Pipeline(spark, cfg)
    result = pipe.run_batch()
    # the durable object lives in the default database (the session temp
    # view of the same name shadows the bare name — query it qualified)
    durable = spark.sql("SELECT * FROM default.vw_canon_counts")
    via_df = result["views"]["vw_canon_counts"]
    assert sorted(map(tuple, durable.collect())) == sorted(map(tuple, via_df.collect()))
    types = {t.tableType for t in spark.catalog.listTables() if t.name == "vw_canon_counts"}
    assert "VIEW" in types  # durable catalog object exists alongside the temp twin
    # view re-reads table state: it must keep working in a fresh query
    assert spark.sql("SELECT SUM(txn_count) c FROM default.vw_canon_counts").collect()[0].c > 0


def test_key_skew_report_hot_key_and_nulls(spark):
    """The skew report surfaces the hot key at rank 1 with exact ppm
    shares, and NULL keys group as a real key (often the hot one)."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.skew import (
        key_skew_report,
    )

    rows = [(None,)] * 6 + [(1,)] * 3 + [(2,)] * 1
    df = spark.createDataFrame(rows, "k int")
    out = {r["rank"]: r for r in key_skew_report(df, ["k"], top_n=3).collect()}
    assert out[1]["k"] is None and out[1]["key_rows"] == 6
    assert out[1]["share_ppm"] == 600_000
    assert out[2]["k"] == 1 and out[2]["cum_share_ppm"] == 900_000
    assert out[3]["k"] == 2 and out[3]["cum_share_ppm"] == 1_000_000


def test_iqr_outlier_report_flags_synthetic_outliers(spark):
    """Positional quartiles on a known group; Tukey fences flag the
    injected extremes on the right sides."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.outliers import (
        iqr_outlier_report,
    )

    # group A: 1..8 plus extremes -100 and 100
    rows = [("A", float(v), i) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8])]
    rows += [("A", -100.0, 90), ("A", 100.0, 91)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    r = iqr_outlier_report(df, ["g"], "v", "id").collect()[0]
    # ordered: -100,1..8,100 (n=10): p25=row3=2, median=row5=4, p75=row8=7
    assert r["n"] == 10
    assert (r["p25"], r["median"], r["p75"]) == (2.0, 4.0, 7.0)
    assert r["lo_fence"] == 2.0 - 1.5 * 5.0 and r["hi_fence"] == 7.0 + 1.5 * 5.0
    assert r["n_low"] == 1 and r["n_high"] == 1
