"""Differential check: every registered query vs its DuckDB oracle.

Replicates the driver's comparison (row count + order-insensitive
value compare with columns sorted by name) so mismatches are caught
before the round gate. Usage:

    python scripts/check_oracle.py [--vanilla] [--only n1,n2,...] [sf_dir]

``--vanilla`` runs on a stock SparkSession (no tuned confs — the
configuration the driver's CORRECTNESS sweep uses), so the gate is
exercised under driver conditions; engine code must set any required
runtime confs itself.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402
from tests.oracle_compare import compare_query  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            print("--only requires a comma-separated list of query names")
            return 2
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
        unknown = only - set(REGISTRY)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-oracle")
    failures = []
    selected = {n: q for n, q in REGISTRY.items() if only is None or n in only}
    for name, q in selected.items():
        t0 = time.time()
        try:
            ok, msg = compare_query(spark, q, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:28s} {dt:6.2f}s  {msg}")
        if not ok:
            failures.append(name)
    print(f"\n{len(selected) - len(failures)}/{len(selected)} queries match")
    if failures:
        print("failures:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
