"""Ordered-sequence funnel analytics: how many users progress through an
ordered step sequence (view -> click -> purchase), advancing a step only
on events strictly AFTER the previous step's match.

The MATCH_RECOGNIZE / funnel primitive of product analytics engines. The
semantics are the standard greedy chain: a user reaches step k when their
time-ordered event sequence contains steps[0..k-1] as a subsequence, each
match taken at its earliest qualifying event (ties broken by the order
column, so results are deterministic under equal timestamps).

Spark-first shape: ONE shuffle (groupBy user) collects each user's events,
sorted in-array; a single sequential fold walks the sorted sequence and
counts how far the step pointer advances — O(events_per_user) per user,
no joins, no window. Per-step user counts then come from one 1-row
aggregate + unpivot. A user's event list must fit an array (the same
bound sessionization carries); the DuckDB oracle uses the equivalent
chained-min formulation (min qualifying (ts, order) per step, each
strictly after the previous), which provably matches the greedy fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_col: str,
    steps: list[str],
) -> DataFrame:
    """Per funnel step: ``(step_idx, step, users_reached)`` — users whose
    ordered event sequence reaches at least that step."""
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(order_col).alias("ord"),
            F.col(type_col).alias("typ"),
        ).alias("__e"),
    )
    per_user = ev.groupBy("__u").agg(
        F.array_sort(F.collect_list("__e")).alias("__seq")
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    typs = F.transform(F.col("__seq"), lambda e: e["typ"])
    reached = F.aggregate(
        typs,
        F.lit(0),
        lambda acc, t: F.when(
            (acc < F.lit(len(steps))) & (t == F.element_at(steps_lit, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    r = per_user.select(reached.alias("__reached"))
    wide = r.agg(
        *[
            F.sum((F.col("__reached") >= k).cast("long"))
            .cast("long")
            .alias(f"__s{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    stack_args = []
    for k, s in enumerate(steps, start=1):
        stack_args += [str(k), f"'{s}'", f"`__s{k}`"]
    return wide.select(
        F.expr(
            f"stack({len(steps)}, {', '.join(stack_args)}) "
            "AS (step_idx, step, users_reached)"
        )
    ).select(
        F.col("step_idx").cast("int").alias("step_idx"),
        "step",
        F.col("users_reached").cast("long").alias("users_reached"),
    )
