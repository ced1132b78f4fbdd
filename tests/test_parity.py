"""Drive every registered parity query against its DuckDB oracle at sf0.01 —
the same check the correctness driver runs (BASELINE.md)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .oracle_compare import compare, duckdb_conn

entrymod.queries()  # populate the registry
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ALL_ORACLE_SQL,
    ALL_QUERIES,
    QUERIES,
)


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


def test_driver_surface_fits_verification_window():
    """The correctness driver checks only the FIRST 50 oracle-paired
    registrations (SURVEY.md §8) — the driver-facing registry must never
    grow past that window again. The bound is 48, not 50: the window
    filled to exactly 50 in rounds 5 AND 6, and both times a new probe
    nearly landed (twice DID land, mid-r6) outside the verified window
    before being caught. Two spare slots is the minimum working headroom;
    fold probes into digest composites before adding driver entries."""
    assert len(entrymod.queries()) <= 48


def test_operator_catalog_matches_registry():
    """docs/OPERATORS.md is generated from the live registry
    (tools/gen_operator_catalog.py); a query added or renamed without
    regenerating the catalog must fail the suite, not silently drift."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tools_dir = os.path.join(root, "tools")
    sys.path.insert(0, tools_dir)
    try:
        import gen_operator_catalog as gen
    finally:
        # remove by VALUE: the module's own body inserts the repo root at
        # index 0, so pop(0) would evict that and leave tools/ behind to
        # shadow later imports
        sys.path.remove(tools_dir)
    with open(os.path.join(root, "docs", "OPERATORS.md")) as f:
        on_disk = f.read()
    assert on_disk == gen.render(), (
        "docs/OPERATORS.md is stale — run: python tools/gen_operator_catalog.py"
    )


@pytest.mark.parametrize("name", sorted(ALL_ORACLE_SQL.keys()))
def test_oracle_parity(spark, sf_oracle, oracle_con, name):
    df = ALL_QUERIES[name](spark, sf_oracle)
    report = compare(df, oracle_con, ALL_ORACLE_SQL[name])
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLE_SQL)))
def test_rows_only_queries_run(spark, sf_oracle, name):
    df = ALL_QUERIES[name](spark, sf_oracle)
    assert df.count() >= 0
