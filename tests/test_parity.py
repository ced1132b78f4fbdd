"""Drive every registered parity query against its DuckDB oracle at sf0.01 —
the same check the correctness driver runs (BASELINE.md)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .oracle_compare import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle_con(sf_oracle):
    con = duckdb_conn(sf_oracle)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_oracle_or_is_flagged():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_parity(spark, sf_oracle, oracle_con, name):
    df = entrymod.queries()[name](spark, sf_oracle)
    report = compare(df, oracle_con, entrymod.oracle_sql()[name])
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize(
    "name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))
)
def test_rows_only_queries_run(spark, sf_oracle, name):
    df = entrymod.queries()[name](spark, sf_oracle)
    assert df.count() >= 0
