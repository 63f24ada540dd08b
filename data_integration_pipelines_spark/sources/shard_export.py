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


SHUFFLE_KEY_COL = "__shuffle_key"


def shuffle_key(id_col, seed: int = 0):
    """Seeded deterministic shuffle key: md5 of ``'<id>:<seed>'``.

    The hex string is the ordering domain, so the permutation it
    induces is (a) a pure function of (id, seed) — re-running on a
    differently-partitioned corpus or a different cluster size yields
    the SAME training order, (b) reproducible in any engine with md5
    (the train_val_test_split portability argument: engine-native
    hashes like xxhash64 vs DuckDB ``hash`` differ), and (c) re-dealt
    wholesale by changing one integer — a new epoch order is
    ``seed+1``, no RNG state to checkpoint."""
    return F.md5(F.concat(id_col.cast("string"), F.lit(f":{int(seed)}")))


def assign_shuffled(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add ``__shard`` + ``__shuffle_key``: shard = first-8-hex-chars
    bucket of the seeded md5 key mod n_shards (non-negative: 8 hex
    chars < 2^32), order inside a shard = (key, id). Map-only — no
    shuffle until the writer repartitions."""
    key = shuffle_key(F.col(key_col), seed)
    return df.withColumn(SHUFFLE_KEY_COL, key).withColumn(
        SHARD_COL,
        (
            F.conv(F.substring(F.col(SHUFFLE_KEY_COL), 1, 8), 16, 10).cast("long")
            % n_shards
        ).cast("int"),
    )


def export_shuffled(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 8,
    seed: int = 0,
) -> dict:
    """Write ``df`` as ``n_shards`` parquet shards in seeded
    pseudo-random order — the trainer-facing global shuffle every
    pipeline ends with (a sequential corpus scan must not feed the
    optimizer source-sorted batches).

    Spark mechanics: one shuffle total — ``repartition(n, __shard)``
    co-locates each shard in exactly one task (every row of a shard
    hashes identically), ``sortWithinPartitions`` orders in-shard with
    no global sort barrier, so each shard directory gets ONE file whose
    row order IS the shuffle order. The manifest carries an
    order-canonical md5 digest per shard (doc ids concatenated in
    shuffle order) aggregated from the same persisted frame the files
    were written from — the registered ``shard_shuffle_manifest`` query
    certifies the identical rows against DuckDB, so the written
    artifact is byte-auditable against the oracle-checked report."""
    from ..operators.cache import bounded_persist

    assigned = bounded_persist(assign_shuffled(df, key_col, n_shards, seed))
    sharded = assigned.repartition(n_shards, F.col(SHARD_COL)).sortWithinPartitions(
        SHARD_COL, SHUFFLE_KEY_COL, key_col
    )
    sharded.drop(SHUFFLE_KEY_COL).write.mode("overwrite").partitionBy(
        SHARD_COL
    ).parquet(path)
    stats = (
        assigned.groupBy(SHARD_COL)
        .agg(
            F.count("*").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct(SHUFFLE_KEY_COL, key_col))
                        ),
                        lambda s: s[key_col].cast("string"),
                    ),
                )
            ).alias("order_md5"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key": key_col,
        "seed": seed,
        "order": "seeded md5 shuffle (md5('<id>:<seed>'))",
        "shards": {
            int(r[SHARD_COL]): {"n_rows": r["n_rows"], "order_md5": r["order_md5"]}
            for r in stats
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, default=str)
    assigned.unpersist()
    return manifest
