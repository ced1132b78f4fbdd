"""As-of join parity queries (operators/asof.py) over the events table.

Attribution shape: for every ``error`` event, the most recent preceding
``click`` by the same user — unbounded, and with a 1-hour tolerance. The
DuckDB oracle is the textbook LATERAL top-1 formulation; the Spark side is
the single-shuffle union+window plan, so parity here proves the sort-merge
rewrite equals the semantic spec. Timestamps compare as epoch
microseconds (exact integers) per the registry conventions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join
from .registry import parity, table

_PROBE = "SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'"
_BUILD = (
    "SELECT user_id, event_id AS click_event_id, value AS click_value, "
    "ts AS click_ts FROM events WHERE event_type = 'click'"
)


def _asof_frames(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    build = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
    )
    return probe, build


def _project(joined):
    return joined.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("err_us"),
        "click_event_id",
        "click_value",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("micros_since"),
    )


def _oracle(extra_pred: str = "") -> str:
    return f"""
    WITH probe AS ({_PROBE}), build AS ({_BUILD})
    SELECT p.user_id, p.event_id, epoch_us(p.ts) AS err_us,
           b.click_event_id, b.click_value,
           epoch_us(p.ts) - epoch_us(b.click_ts) AS micros_since
    FROM probe p LEFT JOIN LATERAL (
        SELECT click_event_id, click_value, click_ts FROM build b
        WHERE b.user_id = p.user_id AND b.click_ts <= p.ts {extra_pred}
        ORDER BY b.click_ts DESC, b.click_event_id DESC LIMIT 1
    ) b ON true
    """


@parity("ns_asof_last_click", driver=False, oracle=_oracle())
def ns_asof_last_click(spark, sf_dir):
    """Per error event: latest prior click by the same user (as-of join)."""
    probe, build = _asof_frames(spark, sf_dir)
    return _project(
        asof_join(
            probe,
            build,
            on=["user_id"],
            probe_ts="ts",
            build_ts="click_ts",
            build_cols=["click_event_id", "click_value", "click_ts"],
            build_order="click_event_id",
        )
    )


@parity(
    "ns_asof_last_click_1h",
    driver=False,
    oracle=_oracle("AND b.click_ts >= p.ts - INTERVAL 1 HOUR"),
)
def ns_asof_last_click_1h(spark, sf_dir):
    """As-of join with a 1-hour tolerance: older clicks are nulled out."""
    probe, build = _asof_frames(spark, sf_dir)
    return _project(
        asof_join(
            probe,
            build,
            on=["user_id"],
            probe_ts="ts",
            build_ts="click_ts",
            build_cols=["click_event_id", "click_value", "click_ts"],
            build_order="click_event_id",
            tolerance=F.expr("INTERVAL 1 HOUR"),
        )
    )


_FWD_ORACLE = f"""
    WITH probe AS ({_PROBE}), build AS ({_BUILD})
    SELECT p.user_id, p.event_id, epoch_us(p.ts) AS err_us,
           b.click_event_id, b.click_value,
           epoch_us(b.click_ts) - epoch_us(p.ts) AS micros_until
    FROM probe p LEFT JOIN LATERAL (
        SELECT click_event_id, click_value, click_ts FROM build b
        WHERE b.user_id = p.user_id AND b.click_ts >= p.ts
        ORDER BY b.click_ts ASC, b.click_event_id ASC LIMIT 1
    ) b ON true
    """


@parity("ns_asof_next_click", driver=False, oracle=_FWD_ORACLE)
def ns_asof_next_click(spark, sf_dir):
    """FORWARD as-of join: per error event, the EARLIEST subsequent click by
    the same user (did the user recover after the error?). Same
    single-shuffle union+window plan, traversed descending."""
    probe, build = _asof_frames(spark, sf_dir)
    joined = asof_join(
        probe,
        build,
        on=["user_id"],
        probe_ts="ts",
        build_ts="click_ts",
        build_cols=["click_event_id", "click_value", "click_ts"],
        build_order="click_event_id",
        direction="forward",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("err_us"),
        "click_event_id",
        "click_value",
        (F.unix_micros("click_ts") - F.unix_micros("ts")).alias("micros_until"),
    )


_NEAREST_ORACLE = f"""
    WITH probe AS ({_PROBE}), build AS ({_BUILD})
    SELECT p.user_id, p.event_id, epoch_us(p.ts) AS err_us,
           b.click_event_id, b.click_value,
           abs(epoch_us(b.click_ts) - epoch_us(p.ts)) AS micros_away
    FROM probe p LEFT JOIN LATERAL (
        SELECT click_event_id, click_value, click_ts FROM build b
        WHERE b.user_id = p.user_id
        ORDER BY abs(epoch_us(b.click_ts) - epoch_us(p.ts)) ASC,
                 (b.click_ts <= p.ts) DESC,
                 CASE WHEN b.click_ts <= p.ts THEN -b.click_event_id
                      ELSE b.click_event_id END ASC
        LIMIT 1
    ) b ON true
    """


@parity("ns_asof_nearest_click", driver=False, oracle=_NEAREST_ORACLE)
def ns_asof_nearest_click(spark, sf_dir):
    """NEAREST as-of join: the click closest in time to each error, in
    either direction, backward winning distance ties (pandas merge_asof
    semantics). One shuffle feeds BOTH running windows (exchange reuse)."""
    probe, build = _asof_frames(spark, sf_dir)
    joined = asof_join(
        probe,
        build,
        on=["user_id"],
        probe_ts="ts",
        build_ts="click_ts",
        build_cols=["click_event_id", "click_value", "click_ts"],
        build_order="click_event_id",
        direction="nearest",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("err_us"),
        "click_event_id",
        "click_value",
        F.abs(F.unix_micros("click_ts") - F.unix_micros("ts")).alias("micros_away"),
    )


@parity(
    "ns_interval_join_sessions",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events
        WHERE event_type = 'click'
    ),
    lagged AS (
        SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        FROM c
    ),
    marked AS (
        SELECT *, CASE WHEN prev IS NULL OR us - prev > 86400000000 THEN 1 ELSE 0 END AS new_s
        FROM lagged
    ),
    sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    ),
    sessions AS (
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
    )
    SELECT e.user_id, e.event_id, epoch_us(e.ts) AS err_us,
           epoch_us(s.session_start) AS s_start_us,
           epoch_us(s.session_end) AS s_end_us,
           s.n_events
    FROM events e
    JOIN sessions s
      ON s.user_id = e.user_id
     AND e.ts BETWEEN s.session_start AND s.session_end
    WHERE e.event_type = 'error'
    """,
)
def ns_interval_join_sessions(spark, sf_dir):
    """Binned interval join (operators/interval_join.py): every error event
    matched into the click-session window (operators/sessionize.py, 1-day
    gap) that contains it — the equi-bin rewrite of a BETWEEN range join,
    checked against the oracle's literal inequality join."""
    from ..operators.interval_join import interval_join
    from ..operators.sessionize import sessionize_batch

    ev = table(spark, sf_dir, "events")
    sessions = sessionize_batch(
        ev.filter(F.col("event_type") == "click"), gap_minutes=1440
    ).select("user_id", "session_start", "session_end", "n_events")
    probe = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    out = interval_join(
        probe,
        sessions,
        on=["user_id"],
        probe_ts="ts",
        start_col="session_start",
        end_col="session_end",
        bin_seconds=86400,
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("err_us"),
        F.unix_micros("session_start").alias("s_start_us"),
        F.unix_micros("session_end").alias("s_end_us"),
        "n_events",
    )


# --------------------------------------------------------------------------
# Driver-slot composite: all four as-of directions in ONE oracle-paired
# query (the individual queries above stay benchable/testable but would
# overflow the driver's 50-entry verification window, SURVEY.md §8).
# --------------------------------------------------------------------------

_DIRECTIONS = [
    ("backward", "ns_asof_last_click", "micros_since", _oracle()),
    (
        "backward_1h",
        "ns_asof_last_click_1h",
        "micros_since",
        _oracle("AND b.click_ts >= p.ts - INTERVAL 1 HOUR"),
    ),
    ("forward", "ns_asof_next_click", "micros_until", _FWD_ORACLE),
    ("nearest", "ns_asof_nearest_click", "micros_away", _NEAREST_ORACLE),
]

_ALL_DIR_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{variant}' AS variant, user_id, event_id, err_us, "
    f"click_event_id, click_value, {delta} AS delta_us FROM ({sql}) __{variant}"
    for variant, _name, delta, sql in _DIRECTIONS
)


@parity("ns_asof_directions", oracle=_ALL_DIR_ORACLE)
def ns_asof_directions(spark, sf_dir):
    """Backward / backward+1h-tolerance / forward / nearest as-of joins
    unioned with a direction label — one driver slot certifies all four
    traversals of operators/asof.py against their LATERAL-top-1 oracles."""
    from .registry import ALL_QUERIES

    out = None
    for variant, name, delta, _sql in _DIRECTIONS:
        d = (
            ALL_QUERIES[name](spark, sf_dir)
            .withColumnRenamed(delta, "delta_us")
            .select(
                F.lit(variant).alias("variant"),
                "user_id",
                "event_id",
                "err_us",
                "click_event_id",
                "click_value",
                "delta_us",
            )
        )
        out = d if out is None else out.unionByName(d)
    return out
