"""Sessionization: batch (analytic windows), streaming
(``session_window`` aggregation), and a custom stateful operator via
``applyInPandasWithState`` (SURVEY §2.10 — the engine's Structured
Streaming extension; the reference itself is batch-only).

Scale notes: batch sessionization is two analytic windows over
(user_id, ts) — one shuffle on user_id, no joins. The streaming form
keys state by user; the watermark bounds state size, and session
state merges as micro-batches arrive. ``applyInPandasWithState``
holds one small state blob per user — memory is O(active users), not
O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us, epoch_us_expr, ts_dtype

SESSION_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000


def sessionize(events: DataFrame, gap_us: int = _GAP_US) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap
    since the previous event exceeds ``gap_us``. Pure analytic windows
    (lag -> boundary flag -> running sum), one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(events, "ts")
    prev_us = F.lag(us).over(w)
    boundary = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(boundary).over(running))


def session_stats(events: DataFrame, gap_us: int = _GAP_US) -> DataFrame:
    """Per-user session rollup: session count, event count, and total
    in-session dwell time in microseconds (exact integer domain —
    reproducible in any engine with epoch-microsecond extraction)."""
    sess = sessionize(events, gap_us)
    us = epoch_us(events, "ts")
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(us) - F.min(us)).alias("dwell_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.sum("dwell_us").alias("total_dwell_us"),
    )


def session_window_counts(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Built-in ``session_window`` aggregation — identical plan batch or
    streaming (with a watermark upstream in the streaming case)."""
    # session_window preserves the input timestamp type in w.start.
    dtype = ts_dtype(events, "ts")
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            epoch_us_expr("w.start", dtype).alias("session_start_us"),
            "n_events",
        )
    )


RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _running_totals_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Per-user running totals across micro-batches. State = (count,
    value sum); each batch emits the updated cumulative row."""
    n, total = state.get() if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": round(total, 6)}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    cumulative per-user event count + value sum, state persisted in the
    checkpoint across micro-batches. On a batch DataFrame this
    degenerates to a single-pass groupBy-equivalent."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
