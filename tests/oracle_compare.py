"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark parity query and its ANSI-SQL oracle on the same parquet tables,
then compares row count, column names, and an order-insensitive canonical
value rendering. Exact (no float tolerance) — the engine's cross-engine
determinism rules (plans/registry.py docstring) are supposed to make that
possible; a failure here means a rule was violated.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _fetch_oracle(res) -> tuple[list[str], list[tuple]]:
    """Fetch DuckDB results the way the driver does — arrow, Decimal→float.

    Empirical contract from CORRECTNESS_r01 + the round-1 verdict: DuckDB
    DECIMAL and HUGEINT render as floats (``138014.0``) on the driver side
    while BIGINT (nullable included) stays int — that is exactly arrow
    export (HUGEINT → decimal128(38,0), DECIMAL → decimal128, BIGINT →
    int64) followed by a Decimal→float conversion. Round 1 shipped 16 hash
    mismatches because this mirror used ``fetchall`` (exact Decimals) and
    therefore agreed with Spark's Decimal rendering when the driver did not.
    Consequence for queries: any DECIMAL/HUGEINT final must be cast to
    DOUBLE/BIGINT on BOTH sides (plans/registry.py docstring).
    """

    def conv(v):
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        return v

    tbl = res.arrow()
    cols = [str(c).lower() for c in tbl.schema.names]
    rows = [tuple(conv(rec[c]) for c in tbl.schema.names) for rec in tbl.to_pylist()]
    return cols, rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = _fetch_oracle(con.execute(sql))

    report = {
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(d_cols),
    }
    report["cols_match"] = sorted(s_cols) == sorted(d_cols)
    report["rows_match"] = len(s_rows) == len(d_rows)
    if report["cols_match"] and report["rows_match"]:
        a = canon_rows(s_cols, s_rows)
        b = canon_rows(d_cols, d_rows)
        report["values_match"] = a == b
        if not report["values_match"]:
            diff_a = [r for r in a if r not in set(b)][:5]
            diff_b = [r for r in b if r not in set(a)][:5]
            report["spark_only_sample"] = diff_a
            report["oracle_only_sample"] = diff_b
    else:
        report["values_match"] = False
    report["ok"] = report["cols_match"] and report["rows_match"] and report["values_match"]
    return report
