"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of fact-fact joins (orders x lineitem,
resources x annotations) is the shuffle. Writing both tables bucketed
by the join key with the same bucket count pins matching keys to
matching files; Spark's bucketed scan then satisfies the join's
distribution requirement directly and the Exchange disappears from
the plan (sort can also be pre-paid with sortBy). This is the batch
equivalent of the reference's per-bucket partitioning of everything
by org/project (SURVEY §1.1) taken down to the join-key level.

The bucket count is a layout-time decision: pick ~(table size /
target partition size), and keep it IDENTICAL across tables that join
— mismatched counts fall back to a shuffle on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed
    parquet table. Joins/aggregations on ``bucket_col`` between tables
    written with the same ``n_buckets`` need no shuffle."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Hive-style partitioned parquet layout. Filters on the partition
    columns prune directories at planning time (PartitionFilters in the
    scan) — the engine never opens non-matching files. This is the
    at-rest twin of the reference's bucket = org/project partitioning
    (SURVEY §1.1): one directory tree per bucket/type, scans touch only
    the buckets they query."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
