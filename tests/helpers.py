"""Shared test helpers for the scoped-merge / streaming-state suites."""

from __future__ import annotations

import hashlib
import os

from financial_data_ingestion_canonical_snowflake_spark.operators.merge import (
    PART_COL,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.storage import (
    ParquetTable,
)


def snapshot(path: str) -> dict[str, str]:
    """rel-path -> content hash for every parquet data file under
    ``path`` — the byte-invariance primitive of the untouched-bucket and
    replay-no-op assertions."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                with open(full, "rb") as fh:
                    out[os.path.relpath(full, path)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
    return out


def bucketed_table(tmp_path, name: str, n_buckets: int = 8) -> ParquetTable:
    """A hash-bucketed scoped-merge state table under ``tmp_path``."""
    return ParquetTable(
        str(tmp_path / name), partition_by=[PART_COL], n_buckets=n_buckets
    )
