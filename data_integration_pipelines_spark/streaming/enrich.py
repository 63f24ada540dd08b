"""Stream-static enrichment: join an unbounded event stream against a
bounded dimension, then aggregate per enriched key in event-time
windows.

The streaming counterpart of the engine's broadcast-dimension rule
(README design rule 4): the dimension side is a plain batch DataFrame —
Spark re-plans it per micro-batch, so a slowly-changing dimension picks
up updates between batches without restarting the query. The join is
stateless (no watermark interaction: only the windowed aggregation
keeps state, bounded by watermark horizon × key cardinality).

Mirrors the batch enrichment joins (J2/J8 — ref
src/neuron_morphology/validation/region_comparison.py:249-250, LRU
ontology caches) for continuous feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static inner join on ``key``; dimension broadcast."""
    return stream.join(F.broadcast(dim), key)


def windowed_enriched_stats(
    enriched: DataFrame,
    group_col: str,
    window: str = "1 hour",
) -> DataFrame:
    """Per-(event-time window, enriched attribute) rollup: row count and
    value sum. Works identically on a batch frame (tested stream==batch)."""
    return (
        enriched.groupBy(F.window("ts", window), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            group_col,
            "n_events",
            "value_sum",
        )
    )
