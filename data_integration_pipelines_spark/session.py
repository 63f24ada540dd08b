"""SparkSession factory with scale-minded defaults.

Local testing runs on ``local[N]`` but every default here is chosen to
also hold on a large multi-executor cluster:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized for the local core count; on a
  real cluster this should be ~2-3x total cores — AQE coalescing makes
  over-provisioning cheap, under-provisioning is what hurts.
- Arrow enabled so any pandas-UDF path is batched, never per-row.
- Session timezone pinned to UTC so timestamp semantics are stable and
  match the DuckDB oracle (naive timestamps).
- Parquet NANOS timestamps read as longs (the ``events`` fixture uses
  TIMESTAMP(NANOS) which Spark refuses natively); the catalog converts
  them to proper timestamps at load.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "data-integration-pipelines-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local"):
        # single-JVM: every task is process-local by construction, so a
        # locality wait only ever adds latency (coalesce()d plans on
        # in-memory relations can otherwise stall seconds per job)
        builder = builder.config("spark.locality.wait", "0s")
    return builder.getOrCreate()
