"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in the engine package's parity registry
(``financial_data_ingestion_canonical_snowflake_spark/plans/parity_*.py``);
this module only re-exports them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the parity modules populates the registry.
from financial_data_ingestion_canonical_snowflake_spark.plans import (  # noqa: E402,F401
    parity_core,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)

for _mod in ("parity_text", "parity_vector", "parity_pipeline", "parity_streaming", "parity_multimodal", "parity_asof", "parity_sketches", "parity_layout", "parity_curation"):
    try:  # optional modules appear as the build widens
        __import__(
            f"financial_data_ingestion_canonical_snowflake_spark.plans.{_mod}"
        )
    except ImportError:
        pass

FLAGSHIP = "a1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001; driver checks rows > 0."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI twin for each hash-checkable query."""
    return dict(ORACLE_SQL)
