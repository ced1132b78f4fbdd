"""Declarative data-quality expectations (dbt-test / Great-Expectations
shape): rules-as-data evaluated in ONE aggregate pass.

The reference pipeline hard-codes its five anomaly rules
(plans/anomaly.py); production tables also need the generic layer — not
null, accepted values, ranges, key uniqueness — evaluated cheaply on every
load. Column rules compile to conditional sums inside a single aggregate
(one scan, one 1-row result); uniqueness rules need a distinct count and
ride the same pass as ``count - approx/exact distinct``.

Scale: the scan is the cost; everything else is map-side conditional
arithmetic. No shuffle for column rules; exact uniqueness adds the
distinct's aggregate exchange (one compact row per key partial)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_keys: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """Evaluate expectations and return one row per rule:
    ``(rule, n_rows, n_violations, passed)``.

    ``rules``: (name, predicate) — the predicate expresses the EXPECTED
    condition; rows where it is false OR NULL count as violations (a NULL
    comparison is a failed expectation, not a free pass).
    ``unique_keys``: (name, [cols]) — violation count = n_rows −
    n_distinct(cols), i.e. the number of surplus duplicate rows. The key
    is counted as a struct, so an all-NULL key is ONE distinct value
    (two NULL-keyed rows are duplicates of each other) — stricter than
    SQL's COUNT(DISTINCT col), which skips NULLs entirely.
    """
    n_rows = F.count(F.lit(1)).cast("long")
    aggs = [n_rows.alias("__n")]
    names: list[str] = []
    for name, pred in rules:
        ok = F.when(pred, F.lit(1)).otherwise(F.lit(0))
        # coalesce: SUM over zero rows is NULL — an empty (violation-free)
        # load must report 0 violations / passed, not NULL
        viol = n_rows - F.coalesce(F.sum(ok), F.lit(0)).cast("long")
        aggs.append(viol.alias(f"__v_{len(names)}"))
        names.append(name)
    for name, cols in unique_keys or []:
        key = F.struct(*[F.col(c) for c in cols])
        aggs.append(
            (n_rows - F.count_distinct(key).cast("long")).alias(
                f"__v_{len(names)}"
            )
        )
        names.append(name)
    row = df.agg(*aggs)
    # One explode over the single agg row — a union of per-rule selects
    # would re-run the aggregate once per rule.
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"__v_{i}").alias("v")
            )
            for i, name in enumerate(names)
        ]
    )
    return row.select(
        F.col("__n").alias("n_rows"), F.explode(entries).alias("e")
    ).select(
        F.col("e.rule").alias("rule"),
        "n_rows",
        F.col("e.v").alias("n_violations"),
        (F.col("e.v") == 0).alias("passed"),
    )
