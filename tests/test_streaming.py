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
