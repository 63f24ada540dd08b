"""Streaming ANN serving layer: a GROWING vector corpus drained as
micro-batches, each batch's exact top-k folded into a versioned
running-answer store via the top-k monoid
(operators/similarity.merge_topk — keep-best-k of unions of
keep-best-k partials == keep-best-k of the whole, under the shared
(cosine_e4 desc, neighbor_id asc) quantized order).

This is the streaming twin of the batch ``ann_topk_incremental``
registry query, with the same exactly-once discipline as the CMS fold
(sketch_fold.py): the store version IS the micro-batch id (a
redelivered batch finds its version complete and skips), and the store
binds to the checkpoint LINEAGE identity so a recreated checkpoint
cannot silently fold a re-batched backlog into stale state.

At 100 TB this is how an ANN serving layer absorbs corpus appends:
per-batch cost (one batch-vs-queries scoring pass + a k*Q-row monoid
merge), never a rescan of the standing corpus; any complete version is
readable forever (time travel, same as the upsert store).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def read_staged_vectors_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of a staged directory of embedding parquet files."""
    from .staged import read_staged_stream

    return read_staged_stream(spark, path, EMB_SCHEMA, max_files_per_trigger)


def fold_topk_batch(
    batch_df: DataFrame,
    batch_id: int,
    query_df: DataFrame,
    store_path: str,
    checkpoint_path: str,
    k: int = 10,
) -> None:
    """One micro-batch fold (the foreachBatch body, module-level so
    replay semantics are directly testable): score the batch against
    the bounded query set, merge into the latest complete store
    version, write ``v=<batch_id>``. Lineage binding and replay
    idempotence come from ``sketch_fold.versioned_fold`` — the shared
    exactly-once monoid-store core (this function carried its own copy
    of the marker logic until r6)."""
    from ..operators.similarity import merge_topk, topk_pandas
    from .sketch_fold import versioned_fold

    versioned_fold(
        batch_df,
        batch_id,
        store_path,
        checkpoint_path,
        lambda state, batch: merge_topk(
            state, topk_pandas(batch, query_df, k=k), k=k
        ),
    )


def streaming_topk(
    stream_vectors: DataFrame,
    query_df: DataFrame,
    store_path: str,
    checkpoint_path: str,
    k: int = 10,
):
    """Drain ``stream_vectors`` with availableNow, folding each
    micro-batch's top-k into the versioned running answer. Returns the
    StreamingQuery; ``read_store(spark, store_path)`` afterwards is
    the exact brute-force top-k over everything drained so far."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_topk_batch(
            batch_df, batch_id, query_df, store_path, checkpoint_path, k=k
        )

    return (
        stream_vectors.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
