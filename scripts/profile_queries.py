"""Per-query time breakdown: Spark plan+execute+toPandas vs DuckDB
oracle vs compare. Usage:

    python scripts/profile_queries.py [--vanilla] [sf_dir] [name ...]

With no names, profiles every registered query in registry order.
``--vanilla`` builds a stock SparkSession (shuffle.partitions=200, no
locality/TZ pins) — the configuration the driver's CORRECTNESS sweep
uses — instead of the tuned ``get_spark`` session.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402
from tests.oracle_compare import compare_frames, duckdb_run  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(REGISTRY)
    if vanilla:
        spark = (
            SparkSession.builder.master("local[32]").appName("profile-vanilla").getOrCreate()
        )
    else:
        spark = get_spark("profile")
    total_s = total_d = 0.0
    print(f"{'query':30s} {'spark':>7s} {'duckdb':>7s} {'cmp':>6s}")
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        spark_pdf = q.fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if q.oracle is not None:
            oracle_pdf = duckdb_run(q.oracle, sf_dir)
            t2 = time.time()
            ok, _ = compare_frames(spark_pdf, oracle_pdf)
            t3 = time.time()
        else:
            t2 = t3 = time.time()
            ok = True
        total_s += t1 - t0
        total_d += t2 - t1
        flag = "" if ok else "  <-- MISMATCH"
        print(f"{name:30s} {t1-t0:7.2f} {t2-t1:7.2f} {t3-t2:6.2f}{flag}")
    print(f"{'TOTAL':30s} {total_s:7.2f} {total_d:7.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
