"""Empirical scale-up probe: replicate the fact tables K× (default 10)
with join-consistent key offsets, then time every headline query at 1×
and K× on the same session/methodology as bench.py.

What this demonstrates (recorded in SCALE.md §1c):
- queries whose cost is the fixed planning/dispatch floor stay flat,
- queries with real per-row work grow ~linearly (never super-linearly:
  no N² pair blowup, no broadcast that stops fitting),
- pushed-down point filters stay flat because the scan prunes.

Replication scheme (a copy is a disjoint "tenant", so every join stays
valid and every planted relationship recurs once per copy):
- orders.o_orderkey / lineitem.l_orderkey   += k * (max+1)
- orders.o_custkey / customer.c_custkey     += k * (max+1)
- events.event_id, events.user_id           += k * (max+1)
- documents.doc_id                          += k * (max+1)
- embeddings.vec_id                         += k * (max+1)
- documents.text: every token suffixed "_k" per copy, so shingle sets
  are copy-disjoint — near-dup PAIRS scale exactly linearly instead of
  exploding cross-copy (each copy is its own dup neighborhood).
- dimension tables (region/nation/part/supplier) stay single-copy:
  dims don't grow 10× when facts do, and they must stay broadcastable.

Usage: python scripts/scale_probe.py [K] [base_sf_dir]
Writes the replica under /tmp/spark-graft-scale{K}x (rebuilt if absent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_integration_pipelines_spark.catalog import TABLES, load_table  # noqa: E402
from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402

_KEY_OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# offset domain per key family so copies never collide
_KEY_FAMILY = {
    "o_orderkey": "order",
    "l_orderkey": "order",
    "o_custkey": "cust",
    "c_custkey": "cust",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}


def build_replica(spark, base_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # one offset per key family, shared across tables so joins stay valid
    family_off: dict[str, int] = {}
    for table, keys in _KEY_OFFSETS.items():
        df = load_table(spark, base_dir, table)
        for key in keys:
            fam = _KEY_FAMILY[key]
            if fam not in family_off:
                family_off[fam] = df.agg(F.max(key)).collect()[0][0] + 1
    for table in TABLES:
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        df = load_table(spark, base_dir, table)
        if table not in _KEY_OFFSETS:
            df.write.parquet(dst)  # dims stay single-copy
            continue
        copies = []
        for i in range(k):
            c = df
            for key in _KEY_OFFSETS[table]:
                off = i * family_off[_KEY_FAMILY[key]]
                c = c.withColumn(key, F.col(key) + F.lit(off))
            if table == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_{i}")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.parquet(dst)


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    frames = {}
    for name, q in REGISTRY.items():
        if q.headline:
            frames[name] = q.fn(spark, sf_dir)
            frames[name].write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for _ in range(2):
        for name, df in frames.items():
            t0 = time.time()
            if REGISTRY[name].time_build:
                # driver-loop algorithms do real work in fn() — time it
                # (same honesty rule as bench.py)
                df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    return timings


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = f"/tmp/spark-graft-scale{k}x"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(out, "embeddings.parquet")):
        build_replica(spark, base, out, k)
    base_t = time_queries(spark, base)
    # drop the persist pool AND the catalog cache between phases: in
    # local mode storage and broadcast builds share ONE heap, and the
    # base phase's pooled tables otherwise squeeze the 30x phase's
    # broadcast allocations (observed notEnoughMemoryToBuildAndBroadcast
    # at k=30 with the stock 8g heap)
    from data_integration_pipelines_spark.operators.cache import release_cached

    release_cached()
    spark.catalog.clearCache()
    scaled_t = time_queries(spark, out)
    report = {
        name: {
            "base_s": base_t[name],
            f"x{k}_s": scaled_t[name],
            "growth": round(scaled_t[name] / base_t[name], 2),
        }
        for name in base_t
    }
    print(json.dumps({"k": k, "base": base, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
