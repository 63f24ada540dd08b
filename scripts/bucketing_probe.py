"""Measure the co-bucketed join against the plain-parquet join at
sf0.1 — the bucketing claim of SCALE.md §2, timed.

Writes orders+lineitem bucketed by the join key (one-time layout cost,
amortized over every subsequent join), then times the same
join+aggregate on both layouts with broadcast disabled (to expose the
fact-fact shuffle the bucketing removes). Prints exchange counts from
the executed plans alongside wall seconds.

Usage: python scripts/bucketing_probe.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_integration_pipelines_spark.catalog import load_table  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402
from data_integration_pipelines_spark.sources.bucketing import (  # noqa: E402
    read_table,
    write_bucketed,
)


def _join_agg(orders, lineitem):
    return (
        orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


def _time(df) -> tuple[float, int]:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return round(best, 3), plan.count("Exchange")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("bucketing-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )

    t0 = time.time()
    write_bucketed(orders, "orders_probe_b", "o_orderkey", n_buckets, sort=True)
    write_bucketed(li, "lineitem_probe_b", "o_orderkey", n_buckets, sort=True)
    layout_s = round(time.time() - t0, 3)

    try:
        plain_s, plain_ex = _time(_join_agg(orders, li))
        buck_s, buck_ex = _time(
            _join_agg(
                read_table(spark, "orders_probe_b"),
                read_table(spark, "lineitem_probe_b"),
            )
        )
        print(
            f"plain parquet:  {plain_s}s  ({plain_ex} Exchange nodes)\n"
            f"co-bucketed:    {buck_s}s  ({buck_ex} Exchange nodes)\n"
            f"one-time layout cost: {layout_s}s  (n_buckets={n_buckets})\n"
            f"join speedup: {plain_s / buck_s:.2f}x"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_probe_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_probe_b")


if __name__ == "__main__":
    main()
