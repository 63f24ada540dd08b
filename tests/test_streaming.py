"""Stream/batch equivalence: the same windowed aggregation drained via
availableNow must equal the batch result (Structured Streaming is the
engine's extension beyond the batch-only reference — SURVEY §2.10)."""

from __future__ import annotations

from data_integration_pipelines_spark.catalog import load_table
from data_integration_pipelines_spark.streaming.events import (
    run_stream_once,
    windowed_counts,
)


def test_stream_matches_batch(spark, sf_small):
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_counts(load_table(spark, sf_small, "events")).collect()
    }
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in run_stream_once(spark, sf_small).collect()
    }
    assert batch == streamed
    assert len(batch) > 0


def test_session_window_stream_matches_batch(spark, sf_small):
    from data_integration_pipelines_spark.streaming.events import read_events_stream
    from data_integration_pipelines_spark.streaming.sessions import (
        session_window_counts,
    )

    batch = {
        (r.user_id, r.session_start_us): r.n_events
        for r in session_window_counts(load_table(spark, sf_small, "events")).collect()
    }
    q = (
        session_window_counts(read_events_stream(spark, sf_small))
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start_us): r.n_events
        for r in spark.table("sessions_stream").collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_apply_in_pandas_with_state_running_totals(spark, sf_small, tmp_path):
    from data_integration_pipelines_spark.streaming.events import read_events_stream
    from data_integration_pipelines_spark.streaming.sessions import (
        running_user_totals,
    )
    from pyspark.sql import functions as F

    events = load_table(spark, sf_small, "events")
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    q = (
        running_user_totals(read_events_stream(spark, sf_small))
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode re-emits a cumulative row per user per micro-batch;
    # the LAST row per user is the final state
    rows = spark.table("user_totals").toPandas()
    final = {
        int(r.user_id): (int(r.n_events), round(float(r.total_value), 6))
        for r in rows.groupby("user_id").tail(1).itertuples()
    }
    # state must cover every user with the exact batch totals
    totals_match = {
        u: (n, t) for u, (n, t) in final.items()
    }
    assert totals_match == expected


def test_streaming_dedup_drops_redelivered_events(spark, sf_small, tmp_path):
    from data_integration_pipelines_spark.streaming.dedup import run_dedup_once

    events = load_table(spark, sf_small, "events")
    staging = str(tmp_path / "staged")
    # simulate at-least-once delivery: the full feed plus a re-delivered
    # sample land as separate files in the staged directory
    events.write.mode("overwrite").parquet(staging)
    events.orderBy("event_id").limit(500).write.mode("append").parquet(staging)

    deduped = run_dedup_once(spark, staging)
    got_ids = [r.event_id for r in deduped.collect()]
    expected_n = events.select("event_id").distinct().count()
    assert len(got_ids) == len(set(got_ids)) == expected_n
