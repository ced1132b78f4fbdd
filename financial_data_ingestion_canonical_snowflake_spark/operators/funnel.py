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
            # coalesce: an empty events frame must report 0, not the NULL
            # a zero-row SUM yields (the oracle's COUNT(*) says 0)
            F.coalesce(
                F.sum((F.col("__reached") >= k).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias(f"__s{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    stack_args = []
    for k, s in enumerate(steps, start=1):
        # escape quotes: step names are interpolated into a SQL literal
        stack_args += [str(k), "'" + s.replace("'", "''") + "'", f"`__s{k}`"]
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


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period (cohort), counted in every later period they return.

    Returns ``(cohort_period, period_offset, active_users)`` where periods
    are ``floor(epoch_days / period_days)`` — integer arithmetic end to
    end, so the matrix is engine-exact. The other half of the product-
    analytics pair with :func:`funnel_counts`.

    Shape: one distinct over (user, period) — the only corpus-wide
    shuffle, map-side-combined — then a per-user min for the cohort and a
    compact (cohort, offset) count. At 100 TB the distinct output is
    bounded by users x active-periods, orders of magnitude below the event
    count.
    """
    period = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date"))
        / F.lit(period_days)
    ).cast("long")
    up = (
        events.select(F.col(user_col).alias("__u"), period.alias("__p"))
        .distinct()
    )
    cohort = up.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        up.join(cohort, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).cast("long").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
