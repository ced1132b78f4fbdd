"""Distributed as-of (point-in-time) join.

For every probe row, attach the most recent build row with the same key
whose timestamp is <= (or <, with ``allow_exact_matches=False``) the probe
timestamp — the temporal-join primitive behind feature lookups ("state of
the account when the txn arrived"), slowly-changing-dimension reads, and
event attribution. The reference engine has no native ASOF; its pipeline
approximates it with latest-wins MERGE snapshots
(sql/05_merge_canonical.sql:22-29) — this operator is the query-time
generalization.

Spark-first plan: instead of a range join (O(probe x build) within key) the
two sides are UNIONed with a side marker and sorted once per key; a
``last(build_payload, ignorenulls=True)`` running window carries the most
recent build row forward onto each probe row. ONE shuffle on the key, no
join at all — the sort-merge pattern that scales linearly per partition at
100 TB. Skewed keys behave like any windowed agg (salt upstream if one key
dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    build_cols: list[str],
    build_order: str | None = None,
    tolerance: Column | None = None,
    allow_exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: probe rows + matching build columns.

    Parameters
    ----------
    on          equality keys present on both sides.
    probe_ts / build_ts   event-time columns (same orderable type).
    build_cols  build-side columns to attach (NULL when no match).
    build_order extra build-side tiebreak for equal timestamps —
                deterministic winner is the LARGEST ``(build_ts,
                build_order)`` for backward, the SMALLEST for forward.
                Defaults to the first of ``build_cols``.
    tolerance   max |probe_ts - build_ts| as a Column interval (e.g.
                ``F.expr("INTERVAL 1 HOUR")``); farther matches are nulled.
    allow_exact_matches   include build rows at exactly probe_ts.
    direction   'backward' (latest build <= probe, the default), 'forward'
                (earliest build >= probe), or 'nearest' (closer of the two,
                backward winning distance ties) — pandas ``merge_asof``
                parity. 'nearest' reuses the SAME exchange for both running
                windows (one shuffle, two sorts), still no join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    order = build_order or build_cols[0]
    b = build.select(
        *on,
        F.col(build_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in dict.fromkeys([*build_cols, build_ts, order])]).alias(
            _PAYLOAD
        ),
    )
    p = probe.select(
        *probe.columns,
        F.col(probe_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(b.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    # Equal timestamps: build sorts before probe when exact matches count,
    # after it when they don't (in BOTH traversal directions); among
    # equal-ts build rows the one sorting immediately before the probe wins
    # the running ``last()`` — largest ``build_order`` for backward
    # (ascending traversal), smallest for forward (descending traversal).
    side = F.col(_SIDE) if allow_exact_matches else -F.col(_SIDE)

    def running(asc: bool) -> Column:
        ts = F.col(_TS).asc() if asc else F.col(_TS).desc()
        tie = F.col(_PAYLOAD)[order].asc() if asc else F.col(_PAYLOAD)[order].desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(ts, side, tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last(_PAYLOAD, ignorenulls=True).over(w)
        if tolerance is not None:
            in_range = (
                m[build_ts] >= F.col(_TS) - tolerance
                if asc
                else m[build_ts] <= F.col(_TS) + tolerance
            )
            m = F.when(in_range, m).otherwise(F.lit(None))
        return m

    if direction == "backward":
        matched = running(asc=True)
    elif direction == "forward":
        matched = running(asc=False)
    else:
        bwd, fwd = running(asc=True), running(asc=False)
        # Timestamp distances via unix_micros — EXACT longs. A double cast
        # yields epoch seconds whose ulp at 2026 epochs is ~0.4 us: two
        # distances differing by exactly 1 us (or a true tie that must go
        # backward) could misorder. Non-timestamp ts types fall back to
        # double (raw numeric axes are already exact to 2^52).
        from pyspark.sql import types as T

        if isinstance(b.schema[_TS].dataType, (T.TimestampType, T.TimestampNTZType)):
            def to_num(c: Column) -> Column:
                return F.unix_micros(c.cast("timestamp"))
        else:
            def to_num(c: Column) -> Column:
                return c.cast("double")
        here = to_num(F.col(_TS))
        d_b = here - to_num(bwd[build_ts])
        d_f = to_num(fwd[build_ts]) - here
        matched = (
            F.when(bwd.isNull(), fwd)
            .when(fwd.isNull(), bwd)
            .when(d_b <= d_f, bwd)  # ties -> backward (pandas semantics)
            .otherwise(fwd)
        )
    out = (
        b.unionByName(p, allowMissingColumns=True)
        .withColumn(_PAYLOAD, matched)
        .filter(F.col(_SIDE) == 1)
    )
    keep = [c for c in probe.columns]
    return out.select(
        *keep, *[F.col(_PAYLOAD)[c].alias(c) for c in build_cols]
    )
