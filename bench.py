"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query is fully materialized via a count-style action that forces
every row through the plan (``df.foreach`` would too, but
``write.format("noop")`` keeps it JVM-side with zero sink cost).

Reading the numbers: at sf0.1 the inputs are ~20 MB, so per-query wall
time is dominated by Spark's fixed costs — Catalyst planning via py4j,
DAG scheduling, task dispatch — a floor of roughly 0.3-0.5 s/query
that is INDEPENDENT of data size. An in-process columnar engine has no
such floor at this scale; the crossover is where per-row work exceeds
the fixed cost (~10-100x this SF), and the engine's operator choices
(broadcasts, partial aggregation, LSH candidate generation, salting,
bucketing) are made for the far side of that crossover. The per-query
deltas between rounds at a FIXED sf are the meaningful signal here.

VM-drift self-normalization (r10, VERDICT r9 task 5): absolute walls
are only comparable across rounds when the box is the same speed — it
hasn't been (the r9 VM read ~20-30% slower than r8's on identical
plans, both engines). So by default the harness ALSO times the DuckDB
oracle SQL of the same headline queries on the same parquet, same
process, best-of-N, and emits ``duckdb_total`` + ``spark_vs_duckdb_
ratio`` in the same JSON line — the ratio is the box-independent
number a round-over-round comparison should read. Disable with
``--no-oracle`` or SPARK_GRAFT_BENCH_ORACLE=0 (e.g. when iterating on
Spark plans only).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in REGISTRY.items() if q.headline}
    # Build each query's DataFrame ONCE and warm it up (same SF, so AQE
    # picks the same physical plans and the codegen cache hits). The
    # warm-up excludes JIT / whole-stage-codegen compilation — a fixed
    # several-second first-run JVM cost independent of data size — from
    # the timed pass; building outside the timer excludes the py4j
    # round-trips of DataFrame construction, which in production
    # amortize to zero over repeated executions of a prepared plan.
    # What IS timed: Catalyst physical planning + scheduling + full
    # execution of every row through the plan, per run.
    frames = {}
    for name, q in bench_queries.items():
        frames[name] = q.fn(spark, sf_dir)
        frames[name].write.format("noop").mode("overwrite").save()

    # best-of-N timed passes (default 3 since r8 — BENCH_r07's committed
    # 9.91 s was a box-load artifact vs the same-session 9.3 s re-read;
    # $SPARK_GRAFT_BENCH_PASSES overrides): steady-state throughput with
    # GC/JIT jitter removed, and the JSON self-documents noise with
    # /proc/loadavg at start/end plus every per-pass reading, so a
    # round-over-round delta can be adjudicated from the artifact alone.
    # time_build queries (driver-loop algorithms — the k-means fit runs
    # Spark jobs inside fn()) re-CONSTRUCT inside the timer: excluding
    # their iterations would understate them vs an oracle that runs the
    # whole algorithm in SQL.
    def loadavg() -> list[float]:
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except OSError:  # non-Linux fallback
            return list(os.getloadavg())

    # load-aware start (r9, VERDICT r8 task 4): BENCH_r08 shipped a
    # 12.1 s headline with loadavg 12 on 32 CPUs — the hygiene fields
    # exposed it, but dashboards still read the polluted number. If the
    # box is busy at bench start (1-min load > cpus/4), wait once for
    # it to drain and re-read; if still busy, run EXTRA passes so the
    # per-query minima (the headline is their sum) get more chances to
    # land in a quiet window. Self-correcting, and self-documenting:
    # the JSON carries the retry and the post-wait load.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    load_retried = False
    extra_passes = 0
    load_start = loadavg()
    if load_start[0] > cpus / 4:
        print(
            f"bench: loadavg {load_start[0]:.2f} > {cpus}/4 at start — "
            "waiting 45 s for the box to drain",
            file=sys.stderr,
        )
        load_retried = True
        time.sleep(45)
        load_start = loadavg()
        if load_start[0] > cpus / 4:
            # extra passes only on the DEFAULT pass count: an explicit
            # SPARK_GRAFT_BENCH_PASSES is an operator instruction the
            # harness must not silently triple
            if "SPARK_GRAFT_BENCH_PASSES" not in os.environ:
                extra_passes = 2
            print(
                f"bench: still loaded ({load_start[0]:.2f}) — "
                + (f"adding {extra_passes} extra passes" if extra_passes
                   else "pass count pinned by SPARK_GRAFT_BENCH_PASSES, "
                        "reading will carry the load in its JSON fields"),
                file=sys.stderr,
            )
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")) + extra_passes
    timings: dict[str, float] = {}
    passes: dict[str, list[float]] = {name: [] for name in frames}
    for _pass in range(n_passes):
        for name, df in frames.items():
            t0 = time.time()
            if bench_queries[name].time_build:
                df = bench_queries[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            passes[name].append(dt)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "n_passes": n_passes,
        "passes": passes,
        "pass_totals": [
            round(sum(p[i] for p in passes.values()), 3)
            for i in range(n_passes)
        ],
        "loadavg_start": load_start,
        "loadavg_end": loadavg(),
        "load_retried": load_retried,
    }

    oracle_on = os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0"
    if "--no-oracle" in sys.argv:
        oracle_on = False
    if "--oracle" in sys.argv:
        oracle_on = True
    if oracle_on:
        # The oracle side gets the SAME load hygiene as the Spark side
        # (r11, VERDICT r10 task 5: BENCH_r10's committed DuckDB numbers
        # ran on a loaded box — curation_funnel 17.6 s vs 8.6 s drained
        # — flattering the ratio): drain-wait once if the box is busy,
        # and run the SAME effective pass count as the Spark side
        # (ADVICE r10: min(n,3) vs n+2 gave the two minima asymmetric
        # chances to land in a quiet window). Both sides' load states
        # ride the JSON so a reader can adjudicate any reading.
        duckdb_load_retried = False
        dload = loadavg()
        if dload[0] > cpus / 4:
            print(
                f"bench: loadavg {dload[0]:.2f} > {cpus}/4 before the "
                "DuckDB oracle passes — waiting 45 s for the box to drain",
                file=sys.stderr,
            )
            duckdb_load_retried = True
            time.sleep(45)
            dload = loadavg()
        dq, dpasses = _time_duckdb_oracles(
            bench_queries, sf_dir, n_passes=n_passes, threads=cpus
        )
        out["duckdb_total"] = round(sum(dq.values()), 3)
        out["duckdb_queries"] = dq
        out["duckdb_n_passes"] = n_passes
        out["duckdb_pass_totals"] = dpasses
        out["duckdb_loadavg_start"] = dload
        out["duckdb_loadavg_end"] = loadavg()
        out["duckdb_load_retried"] = duckdb_load_retried
        out["spark_vs_duckdb_ratio"] = (
            round(total / out["duckdb_total"], 3) if out["duckdb_total"] else None
        )

    print(json.dumps(out))


def _time_duckdb_oracles(
    bench_queries, sf_dir: str, *, n_passes: int, threads: int
):
    """Best-of-N DuckDB wall per headline query's oracle SQL — the
    same-box baseline that makes the Spark headline portable across VM
    speeds. Same parquet, one in-process connection with the same
    thread budget, results fully materialized via fetchall()."""
    import duckdb

    from data_integration_pipelines_spark.catalog import TABLES

    con = duckdb.connect()
    try:
        con.execute(f"SET threads TO {threads}")
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        sqls = {
            name: q.oracle
            for name, q in bench_queries.items()
            if q.oracle is not None
        }
        # warm-up pass: OS page cache + duckdb catalog, mirroring the
        # Spark side's excluded JIT/codegen warm-up
        for sql in sqls.values():
            con.execute(sql).fetchall()
        timings: dict[str, float] = {}
        pass_totals: list[float] = []
        for _ in range(n_passes):
            pt = 0.0
            for name, sql in sqls.items():
                t0 = time.time()
                con.execute(sql).fetchall()
                dt = round(time.time() - t0, 3)
                pt += dt
                timings[name] = min(timings.get(name, dt), dt)
            pass_totals.append(round(pt, 3))
        return timings, pass_totals
    finally:
        con.close()


if __name__ == "__main__":
    main()
