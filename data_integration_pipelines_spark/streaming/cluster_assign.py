"""Streaming cluster assignment: score an embedding feed against
FIXED k-means centroids.

The payoff of the broadcast-centroids design (operators/clustering.py)
shows up here: assignment is a stateless map-only expression over
driver-inlined centroid literals, so the SAME code path that scores a
batch runs unchanged inside a streaming query — no state store, no
watermark, no shuffle; each micro-batch row is scored as it arrives.
This is the online half of SemDeDup-style curation: fit centroids on
yesterday's corpus (kmeans_fit), assign today's feed as it streams in,
route each vector to its cluster's dedup ring downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.clustering import assign_clusters, quantize_vec

EMBEDDINGS_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def read_staged_embeddings_stream(
    spark, path: str, max_files_per_trigger: int | None = None
):
    """Streaming scan of a staged directory of embedding parquet files."""
    from .staged import read_staged_stream

    return read_staged_stream(spark, path, EMBEDDINGS_SCHEMA, max_files_per_trigger)


def streaming_assign(
    stream_df: DataFrame,
    centroids: list[tuple[int, list[int]]],
    out_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Drain ``stream_df`` with availableNow, appending
    (id, cluster, dist) per vector. ``centroids`` come from a prior
    ``kmeans_fit`` — the assignment expression is identical, so the
    streamed result equals the batch result row-for-row."""
    from pyspark.sql import functions as F

    qdf = stream_df.select(
        F.col(id_col).alias("id"), quantize_vec(F.col(vec_col)).alias("qvec")
    )
    assigned = assign_clusters(qdf, centroids).select("id", "cluster", "dist")
    return (
        assigned.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
