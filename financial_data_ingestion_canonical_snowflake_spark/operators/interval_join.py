"""Binned interval (range) join: probe_ts BETWEEN start AND end, no cartesian.

Spark plans a raw ``l.ts >= r.start AND l.ts <= r.end`` join as a broadcast
nested loop (or a cartesian when neither side broadcasts) — O(|probe| x
|intervals|) per key and a non-starter at 100 TB. The standard scale
rewrite: quantize time into fixed bins, explode each interval into the
bins it covers, compute the probe row's single bin, equi-join on
(keys + bin), then apply the exact BETWEEN as a residual filter.

Cost model: one shuffle-partitioned hash join; interval replication factor
= interval_length / bin_seconds (pick bins near the typical interval
length). Exactness is unaffected — the residual filter re-checks the real
bounds; bins only limit which pairs are ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__itv_bin"


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    on: list[str],
    probe_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of probe rows onto every interval containing them.

    ``on``: equality keys on both sides (may be empty). Output columns:
    probe columns + interval columns (minus duplicated keys) — any OTHER
    shared column name is rejected up front (the residual filter would hit
    ambiguous-column resolution mid-plan otherwise; rename before joining).

    Inverted intervals (``end < start``) match nothing under BETWEEN, so
    they are filtered out before the bin explode — semantically exact, and
    it keeps ``sequence(start_bin, end_bin)`` from silently generating a
    descending bin range.
    """
    dup = (set(probe.columns) & set(intervals.columns)) - set(on)
    if dup:
        raise ValueError(
            f"interval_join: ambiguous non-key columns on both sides: {sorted(dup)}; "
            "rename them on one side first"
        )
    intervals = intervals.filter(F.col(start_col) <= F.col(end_col))
    w = bin_seconds * 1_000_000
    b = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / w).cast("long"),
                F.floor(F.unix_micros(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    p = probe.withColumn(
        _BIN, F.floor(F.unix_micros(F.col(probe_ts)) / w).cast("long")
    )
    return (
        p.join(b, [*on, _BIN])
        .filter(
            (F.col(probe_ts) >= F.col(start_col))
            & (F.col(probe_ts) <= F.col(end_col))
        )
        .drop(_BIN)
    )
