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

import os
import re

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


def sf_tag(sf_dir: str) -> str:
    """Table-name-safe tag for a scale-factor directory."""
    return re.sub(r"[^0-9A-Za-z]", "_", os.path.basename(sf_dir.rstrip("/")))


def ensure_cobucketed_facts(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> tuple[str, str]:
    """Idempotently materialize the orders/lineitem fact pair co-bucketed
    by the join key (lineitem's key renamed to ``o_orderkey`` so both
    sides bucket AND join on the same column name). Returns the two
    table names.

    This is the default fact-fact layout: pay the bucketed write once,
    and every subsequent join/aggregation on the key plans without an
    Exchange (measured 2.1x on the probe — scripts/bucketing_probe.py).
    With an in-memory catalog the metadata dies with the session, so a
    new session re-lays the tables; a real deployment keeps them in a
    persistent metastore and the check is a pure metadata hit."""
    from ..catalog import load_table

    tag = sf_tag(sf_dir)
    orders_t, lineitem_t = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"
    if not (spark.catalog.tableExists(orders_t) and spark.catalog.tableExists(lineitem_t)):
        # With an in-memory catalog a previous session's table DIRECTORY
        # can outlive its metadata; the layout is a derived cache, so
        # clear the stale location rather than failing saveAsTable with
        # LOCATION_ALREADY_EXISTS.
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        warehouse = re.sub(r"^file:/{0,2}", "/", warehouse).replace("//", "/")
        for t in (orders_t, lineitem_t):
            if not spark.catalog.tableExists(t):
                shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, "orders"), orders_t, "o_orderkey", n_buckets
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            lineitem_t,
            "o_orderkey",
            n_buckets,
        )
    return orders_t, lineitem_t


def fact_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, bool]:
    """Resolve the orders/lineitem fact pair, PREFERRING the co-bucketed
    layout when it already exists in the catalog (probe only — never
    triggers the bucketed write; ``ensure_cobucketed_facts`` is the
    explicit layout step). Returns ``(orders, lineitem, bucketed)`` with
    lineitem's join key under its usual ``l_orderkey`` name on both
    paths, so every fact-fact consumer can call this unconditionally:
    the Exchange-free hop is the default path real users get once the
    layout exists, not an opt-in query variant.

    The rename back from the bucketed column (``o_orderkey`` ->
    ``l_orderkey``) keeps the shuffle-free plan: Spark's alias-aware
    output partitioning propagates the bucketed distribution through
    the Project (pinned in tests/test_bucketing.py)."""
    from ..catalog import load_table

    tag = sf_tag(sf_dir)
    orders_t, lineitem_t = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"
    if spark.catalog.tableExists(orders_t) and spark.catalog.tableExists(lineitem_t):
        return (
            spark.table(orders_t),
            spark.table(lineitem_t).withColumnRenamed("o_orderkey", "l_orderkey"),
            True,
        )
    return (
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        False,
    )


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


def ensure_time_partitioned_events(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> str:
    """Idempotently materialize ``events`` Hive-partitioned by event
    DATE — the at-rest layout for time-series facts at scale: date
    predicates prune whole directories at planning time, so a
    one-day query over a year of data opens ~1/365 of the files.
    Returns the layout path. The write is paid once per sf_dir (a
    real deployment ingests into this layout continuously)."""
    import tempfile

    from ..catalog import load_table

    base = base_dir or os.path.join(
        tempfile.gettempdir(), f"spark_graft_events_bydate_{sf_tag(sf_dir)}"
    )
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        from pyspark.sql import functions as F

        ev.withColumn("event_date", F.to_date("ts")).write.mode(
            "overwrite"
        ).partitionBy("event_date").parquet(base)
    return base
