"""Stream-stream joins with watermark-bounded state (SURVEY §2.10
extension — the batch engine's as-of/temporal joins, continuous).

A stream-stream inner join must buffer rows until a match can be ruled
out; unbounded, that is unbounded state. Two things bound it here:

1. watermarks on BOTH event-time columns (rows older than the horizon
   are evicted from join state), and
2. an event-time RANGE in the join condition (``purchase within
   [view, view + horizon]``) that tells the planner exactly how long a
   buffered row can still match.

State is then O(arrival rate x horizon) per side, independent of
stream length — the same contract as the rest of streaming/ (dedup,
sessions, upsert).

The canonical use: attribution — pair each conversion event with the
qualifying prior exposure events inside the horizon. The batch twin of
this join is a plain time-range join, and the tests pin stream ==
batch equality on the drained backlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_attribution(
    events: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Pair every purchase with each view by the same user in the
    preceding ``horizon`` (inclusive on both ends). Works identically
    on a streaming frame (watermarked, state-bounded) and a batch
    frame (plain range join) — the stream==batch test relies on that.

    Returns (user_id, view_id, purchase_id, purchase_value,
    secs_between).
    """
    streaming = events.isStreaming
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        views = views.withWatermark("view_ts", horizon)
        purchases = purchases.withWatermark("purchase_ts", horizon)
    cond = (
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.expr(f"view_ts + INTERVAL {horizon}"))
    )
    joined = views.join(purchases, cond)
    return joined.select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        "purchase_value",
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts").cast("timestamp"))
        ).cast("bigint").alias("usecs_between"),
    )


def run_attribution_once(
    spark, sf_dir: str, horizon: str = "1 hour", query_name: str = "attributed"
) -> DataFrame:
    """Drain the events backlog through the stream-stream join with
    availableNow into an in-memory table (tests prove stream == batch
    range join)."""
    from .events import read_events_stream

    # watermark=None: the join sets its own watermarks on the renamed
    # per-side event-time columns (redefining one is an error)
    stream = read_events_stream(spark, sf_dir, watermark=None)
    out = view_purchase_attribution(stream, horizon)
    query = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)
