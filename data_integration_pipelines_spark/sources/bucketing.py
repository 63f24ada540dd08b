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
