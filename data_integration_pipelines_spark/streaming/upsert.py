"""Streaming upsert sink: ``foreachBatch`` merge into a keyed store.

The reference's write-back loop (register/update/deprecate with
``_rev`` bumps — S17, ref
src/neuron_morphology/validation/quality_metric_resource.py:358-370)
re-expressed for a continuous feed: each micro-batch merges into a
keyed store — insert new keys at ``_rev`` = 1, bump ``_rev`` on
changed keys, leave untouched keys alone (no deprecation: a
micro-batch is an increment, not a snapshot; snapshot semantics live
in operators/merge.apply_merge).

Convergence property (tested): per-batch rows reduce to latest-per-key
first and stale rows never overwrite newer store rows (event-time
guard), so the final store equals the BATCH keep-latest answer for any
micro-batch partitioning of the input — at-least-once re-delivery and
out-of-order arrival included.

Store layout: versioned parquet directories ``v=K`` under the store
root; each merge writes ``K+1`` and readers pick the max complete
version. Never reads and overwrites the same files (the classic
self-overwrite hazard). On a lakehouse this whole module is
``MERGE INTO`` on a Delta/Iceberg table — the versioning is what those
formats' transaction logs do, reduced to directories.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import keep_latest

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _versions(store_path: str) -> list[int]:
    if not os.path.isdir(store_path):
        return []
    out = []
    for name in os.listdir(store_path):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(store_path, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_store(
    spark: SparkSession, store_path: str, version: int | None = None
) -> DataFrame | None:
    """A complete version of the store, or None before first write.

    ``version=None`` -> latest. Any earlier complete version is
    readable forever (the store is append-only versions — time travel
    for free, the property Delta charges a transaction log for).
    Raises KeyError for a version that does not exist or never
    completed."""
    versions = _versions(store_path)
    if not versions:
        if version is not None:
            raise KeyError(
                f"store version {version} not found; store at "
                f"{store_path!r} has no complete versions"
            )
        return None
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise KeyError(
            f"store version {version} not found; complete versions: {versions}"
        )
    return spark.read.parquet(os.path.join(store_path, f"v={version}"))


def upsert_batch(
    existing: DataFrame | None,
    batch: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    rev_col: str = "_rev",
) -> DataFrame:
    """Merge one micro-batch into the store state.

    - reduce the batch to latest-per-key (tie-break on all value
      columns for determinism under re-delivery)
    - new key -> insert with ``rev_col`` = 1
    - existing key, newer ``ts_col`` -> batch values, rev + 1
    - existing key, older-or-equal ``ts_col`` -> keep store row (late
      or duplicate data never regresses state, and equal-ts re-delivery
      does not bump revisions)
    """
    value_cols = [c for c in batch.columns if c not in key_cols]
    tiebreak = [c for c in value_cols if c != ts_col]
    latest = keep_latest(batch, key_cols, ts_col, tiebreak_cols=tiebreak)
    incoming = latest.select(
        *key_cols, *[F.col(c).alias(f"__in_{c}") for c in value_cols]
    )
    if existing is None:
        return incoming.select(
            *key_cols,
            *[F.col(f"__in_{c}").alias(c) for c in value_cols],
            F.lit(1).alias(rev_col),
        )

    joined = existing.join(incoming, on=list(key_cols), how="full_outer")
    has_new = F.col(f"__in_{ts_col}").isNotNull()
    has_old = F.col(ts_col).isNotNull()
    takes_new = has_new & (~has_old | (F.col(f"__in_{ts_col}") > F.col(ts_col)))
    merged_vals = [
        F.when(takes_new, F.col(f"__in_{c}")).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    new_rev = (
        F.when(~has_old, F.lit(1))
        .when(takes_new, F.col(rev_col) + 1)
        .otherwise(F.col(rev_col))
    )
    return joined.select(*key_cols, *merged_vals, new_rev.alias(rev_col))


def streaming_upsert(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    rev_col: str = "_rev",
):
    """Attach a foreachBatch upsert sink to ``stream`` and return the
    started query (availableNow trigger: drain what exists, then stop).

    Each micro-batch: read latest store version -> merge -> write
    version K+1. foreachBatch is the documented Spark pattern for sinks
    with merge semantics that aren't native streaming sinks."""
    spark = stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        existing = read_store(spark, store_path)
        merged = upsert_batch(existing, batch_df, key_cols, ts_col, rev_col)
        next_v = (_versions(store_path)[-1] + 1) if existing is not None else 0
        merged.write.mode("overwrite").parquet(
            os.path.join(store_path, f"v={next_v}")
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
