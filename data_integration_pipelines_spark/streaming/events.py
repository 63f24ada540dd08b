"""Structured Streaming ingest of the events table (SURVEY §2.10).

The reference is batch-only (paginated scans); this is the
Spark-native extension: the same declarative aggregation runs bounded
(batch) or unbounded (stream) — watermarked event-time windows handle
late data, ``availableNow`` drains a backlog exactly once.

Scale notes: streaming aggregation state is keyed by (window,
event_type); the watermark bounds state size. At 100 TB/day the same
plan runs with kafka sources + checkpointing — nothing here is
fixture-specific except the parquet source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Legacy layout: events.ts physically TIMESTAMP(NANOS), surfaced as a
# long under spark.sql.legacy.parquet.nanosAsLong.
EVENTS_SCHEMA_NANOS = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Event-time windowed aggregation — identical plan for batch and
    streaming inputs."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, watermark: str | None = "2 hours"
) -> DataFrame:
    """Streaming scan of the events parquet, normalizing ``ts`` the same
    way the batch catalog does: a schema-only batch probe decides whether
    the file stores TIMESTAMP(NANOS) (legacy long path) or a real
    timestamp type (used verbatim). ``watermark=None`` skips the
    watermark so downstream operators that rename the event-time column
    (stream-stream joins) can set their own — Spark forbids redefining
    one."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    )
    if dict(probe.dtypes).get("ts") == "bigint":
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA_NANOS)
            .option("pathGlobFilter", "events.parquet")  # file source wants a dir
            .parquet(sf_dir)
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    else:
        raw = (
            spark.readStream.schema(probe.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        if dict(raw.dtypes).get("ts") == "timestamp_ntz":
            # Watermarks require TIMESTAMP. Pin the session to UTC so the
            # NTZ->LTZ cast preserves the wall-clock instant exactly and
            # stream output matches the batch (NTZ) formatting.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is None:
        return raw
    return raw.withWatermark("ts", watermark)


def run_stream_once(spark: SparkSession, sf_dir: str, window: str = "1 hour") -> DataFrame:
    """Drain the backlog with availableNow into an in-memory table and
    return the result as a batch DataFrame (used by tests to prove
    stream/batch equivalence)."""
    stream = windowed_counts(read_events_stream(spark, sf_dir), window)
    query = (
        stream.writeStream.format("memory")
        .queryName("events_windowed")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("events_windowed")
