"""Per-query exchange inventory from EXECUTED plans — the generator
behind SCALE.md §1's table, automated so the doc can't drift from the
plans.

For every headline query (or all with --all): execute at the given SF,
then count in the final AQE plan:
- work  = Exchange hashpartitioning (real redistribution)
- sort  = Exchange rangepartitioning (presentation orderBy)
- rr    = Exchange roundrobin (the `spread` fan-out)
- bcast = BroadcastExchange / BroadcastQueryStage

Usage: python scripts/shuffle_inventory.py [sf_dir] [--all]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    everything = "--all" in sys.argv
    spark = get_spark("shuffle-inventory")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'query':30s} {'work':>4s} {'sort':>4s} {'rr':>3s} {'bcast':>5s}")
    for name, q in REGISTRY.items():
        if not (everything or q.headline):
            continue
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # finalize AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        work = plan.count("Exchange hashpartitioning")
        sort = plan.count("Exchange rangepartitioning")
        rr = plan.count("Exchange RoundRobinPartitioning") + plan.count(
            "Exchange roundrobin"
        )
        bcast = plan.count("BroadcastExchange") + plan.count("BroadcastQueryStage")
        print(f"{name:30s} {work:4d} {sort:4d} {rr:3d} {bcast:5d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
