"""Streaming exact deduplication with watermark-bounded state.

At-least-once sources (kafka, file backfills, upsert feeds) re-deliver
rows; the batch engine's ``exact_dedup``/``dropDuplicates`` answer
would need unbounded state on an unbounded stream. Spark's
``dropDuplicatesWithinWatermark`` keeps per-key state only until the
event-time watermark passes the key's first arrival — the streaming
counterpart of the dedup suite (operators/dedup.py), with state size
bounded by (arrival rate x watermark horizon) regardless of total
stream length.

Used for: exactly-once-style event ingestion, and streaming document
dedup when the key is a content fingerprint (functions/text.fingerprint)
instead of an id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

STAGED_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_staged_events_stream(
    spark: SparkSession,
    path: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of a staged directory of event parquet files
    (normalized timestamps, e.g. written by the batch catalog).
    ``max_files_per_trigger`` bounds micro-batch size (and with
    availableNow splits a backlog into several micro-batches)."""
    from .staged import read_staged_stream

    raw = read_staged_stream(spark, path, STAGED_EVENTS_SCHEMA, max_files_per_trigger)
    return raw.withWatermark("ts", watermark)


def dedup_within_watermark(
    stream: DataFrame, keys: Sequence[str] = ("event_id",)
) -> DataFrame:
    """First-arrival-wins dedup on ``keys``; duplicates arriving within
    the watermark horizon of the first occurrence are dropped, state is
    evicted once the watermark passes."""
    return stream.dropDuplicatesWithinWatermark(list(keys))


def run_dedup_once(
    spark: SparkSession,
    path: str,
    keys: Sequence[str] = ("event_id",),
    query_name: str = "events_deduped",
) -> DataFrame:
    """Drain the staged backlog with availableNow through the streaming
    dedup into an in-memory table; returns the result as a batch
    DataFrame (tests prove stream==batch-distinct equivalence)."""
    query = (
        dedup_within_watermark(read_staged_events_stream(spark, path), keys)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)
