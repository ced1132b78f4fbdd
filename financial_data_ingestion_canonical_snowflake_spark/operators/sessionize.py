"""Event sessionization: gap-based sessions per user, batch and streaming.

Batch: the classic two-window plan — ``lag`` marks session starts (gap
exceeded), a running sum assigns session ids, then one groupBy rolls up.
Two window passes + one aggregate over a single hash-partitioning by user:
Catalyst plans ONE shuffle for the whole thing.

Streaming: ``applyInPandasWithState`` keeps one open session per user in the
state store. A new event either extends the open session or closes it
(emitting the closed row) and starts a new one. Without a watermark/timeout
the per-user LAST session stays open forever — by design here: closed
sessions are emitted deterministically regardless of watermark progress,
and the open tail can be flushed by a final state sweep in production (or
use an EventTimeTimeout variant when late-data bounds exist). State is
4 scalars per user — bounded, shard-partitioned by the grouping key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): start/end/event-count/value-sum."""
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us, "event_id")
    new_session = (
        F.when(F.lag(us).over(w).isNull(), 1)
        .when(us - F.lag(us).over(w) > gap_us, 1)
        .otherwise(0)
    )
    sess = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            F.col("event_id"),
        )
        .withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("session_id")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization emitting CLOSED sessions (append mode).

    Works across micro-batches AND query restarts: the open-session state
    lives in the checkpointed state store.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = None
            last_us = n = 0
            total = 0.0
        closed = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, "event_id"])
        for ts, val in zip(batch[ts_col], batch[value_col]):
            ev_us = int(pd.Timestamp(ts).value) // 1000
            if start_us is None:
                start_us, last_us, n, total = ev_us, ev_us, 1, float(val)
            elif ev_us - last_us > gap_us:
                closed.append((user, start_us, last_us, n, total))
                start_us, last_us, n, total = ev_us, ev_us, 1, float(val)
            else:
                last_us, n, total = ev_us, n + 1, total + float(val)
        state.update((start_us, last_us, n, total))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [c[4] for c in closed],
                }
            )

    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias(ts_col),
            F.col(value_col).alias(value_col),
            F.col("event_id"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
