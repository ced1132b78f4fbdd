"""Parity-query registry.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py``
re-exports the registry to the correctness driver.

Cross-engine determinism rules used throughout (SURVEY.md §7.4):
- per-row arithmetic stays in DOUBLE (IEEE ops are bit-identical in both
  engines), aggregate inputs are cast to DECIMAL(18,6) per row (exact sums),
  and final aggregates/decimal outputs are cast to DOUBLE on both sides —
  the driver's hasher renders DuckDB DECIMAL/HUGEINT through float64, so a
  DECIMAL final on the Spark side ("138014.000000") can never hash-match
  ("138014.0"); integer-sum finals are pinned with CAST(... AS BIGINT) in
  the oracle for the same reason (DuckDB SUM(int) is HUGEINT);
- timestamps are rendered with pinned formats (``date_format`` <->
  ``strftime``), never returned raw;
- string concatenation uses NULL-propagating forms on both sides
  (``F.concat`` <-> ``||``);
- integer hashing shared with the oracle goes through md5-hex prefix
  parsing (``scalars.md5_long``), never Spark-private hash functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def parity(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a parity query; ``oracle`` is the DuckDB-ANSI twin."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return wrapped

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md).

    TIMESTAMP(NANOS) parquet columns arrive as nano-epoch longs (see
    ``nanosAsLong`` in session.RUNTIME_CONFS); convert them back to
    microsecond timestamps with exact integer division — a double division
    would lose sub-second precision at 1.7e18 nanos.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
