"""Slowly-changing-dimension type-2 build from a keyed change stream.

The warehouse-canonical versioned-dimension shape: each key's state changes
over time; the SCD2 table has one row per (key, version) with an effective
range [eff_from, eff_to) and an open (NULL eff_to) current version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_build(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    seq_col: str,
    with_seq: bool = False,
) -> DataFrame:
    """Collapse a change stream into SCD2 version rows.

    - ``lag`` drops rows whose state equals the key's previous state
      (consecutive duplicates open no new version);
    - ``lead`` closes each surviving version with the next change's
      timestamp; the last version stays open (``eff_to_us`` NULL,
      ``is_current`` 1).
    - ``seq_col`` breaks timestamp ties deterministically.

    Both window passes share one (key, ts, seq) sort — the change filter
    preserves partitioning AND order, so Catalyst plans ONE exchange for
    the whole build (plan-asserted in tests). Epoch-micro integers keep
    the output engine-exact.

    Returns ``(key_col, version_n, state, eff_from_us, eff_to_us,
    is_current)``; ``with_seq=True`` appends ``eff_from_seq`` (the opening
    event's ``seq_col``) — the streaming maintenance sink stores it so
    version re-expansion preserves tie-break order across micro-batches.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    changes = (
        df.select(key_col, state_col, ts_col, seq_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
    )
    eff_from = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cols = [
        key_col,
        F.row_number().over(w).cast("long").alias("version_n"),
        F.col(state_col).alias("state"),
        eff_from.alias("eff_from_us"),
        F.lead(eff_from).over(w).alias("eff_to_us"),
        F.when(F.lead(ts_col).over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
    ]
    if with_seq:
        cols.append(F.col(seq_col).cast("long").alias("eff_from_seq"))
    return changes.select(*cols)
