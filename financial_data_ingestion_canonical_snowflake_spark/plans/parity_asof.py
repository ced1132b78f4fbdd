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


@parity("ns_asof_last_click", oracle=_oracle())
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
