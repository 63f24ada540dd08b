"""Sharded training-dataset export: N deterministic shards, each
internally ordered, plus a manifest.

The consumer side of a curation pipeline is a trainer that wants (a) a
FIXED shard count it can map to data-loader workers, (b) rows within a
shard in a deterministic order (curriculum key, length-bucketing for
packing, or plain id for reproducibility), and (c) a manifest saying
what landed where without re-scanning the data.

Spark mechanics: ``repartition(n, hash_col)`` fixes the shard count
and makes shard membership a pure function of the key (stable across
runs and cluster sizes — NOT round-robin, which depends on task
layout), then ``sortWithinPartitions`` orders rows inside each shard
with no global sort barrier. One shuffle total; each task writes its
own file. The manifest aggregates the SAME persisted shard-assigned frame the
files were written from (count/min/max per shard), so the two jobs
see one materialization — no recompute, no drift window.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "__shard"


def assign_shards(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard id in [0, n_shards): pmod of a 64-bit hash
    of the key — membership depends only on the key value, never on
    partitioning or task order."""
    return df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )


def export_sharded(
    df: DataFrame,
    path: str,
    key_col: str,
    sort_col: str,
    n_shards: int = 8,
) -> dict:
    """Write ``df`` as ``n_shards`` parquet shards, each sorted by
    ``(sort_col, key_col)``, and a ``_manifest.json``. Returns the
    manifest dict. One shuffle (the repartition); the in-shard sort is
    shuffle-free."""
    from ..operators.cache import bounded_persist

    assigned = bounded_persist(assign_shards(df, key_col, n_shards))
    sharded = assigned.repartition(n_shards, F.col(SHARD_COL)).sortWithinPartitions(
        SHARD_COL, sort_col, key_col
    )
    sharded.write.mode("overwrite").partitionBy(SHARD_COL).parquet(path)
    stats = (
        assigned.groupBy(SHARD_COL)
        .agg(
            F.count("*").alias("n_rows"),
            F.min(sort_col).alias("sort_min"),
            F.max(sort_col).alias("sort_max"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key": key_col,
        "sort": sort_col,
        "shards": {
            int(r[SHARD_COL]): {
                "n_rows": r["n_rows"],
                "sort_min": r["sort_min"],
                "sort_max": r["sort_max"],
            }
            for r in stats
        },
    }
    # leading underscore: Spark/Hive/pyarrow/duckdb directory listings
    # all skip underscore-prefixed files, so strict parquet readers
    # globbing the dataset never mistake the manifest for a data file
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, default=str)
    return manifest
