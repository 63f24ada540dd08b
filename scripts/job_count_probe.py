"""Per-headline-query wall time + Spark JOB COUNT probe.

At sf0.1 each Spark job pays a fixed ~0.2-0.4 s dispatch floor
(Catalyst planning via py4j + DAG scheduling + task dispatch), so the
number of jobs a query launches is the first-order cost driver — AQE
stage re-optimization, driver-loop collects and broadcast builds all
surface here. Usage:

    python scripts/job_count_probe.py [sf_dir] [name ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or [n for n, q in REGISTRY.items() if q.headline]
    spark = get_spark("job-count-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm-up (mirrors bench.py): build + run once outside the timer
    frames = {}
    for name in names:
        q = REGISTRY[name]
        frames[name] = q.fn(spark, sf_dir)
        frames[name].write.format("noop").mode("overwrite").save()

    print(f"{'query':32s} {'wall_s':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    total_w = total_j = 0.0
    for name in names:
        q = REGISTRY[name]
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = frames[name]
        if q.time_build:
            df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        total_w += dt
        total_j += len(job_ids)
        print(f"{name:32s} {dt:7.3f} {len(job_ids):5d} {n_stages:7d} {n_tasks:6d}")
    print(f"{'TOTAL':32s} {total_w:7.3f} {int(total_j):5d}")


if __name__ == "__main__":
    main()
