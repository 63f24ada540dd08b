"""Dump formatted physical plans for round-11 before/after evidence.

Usage: python scripts/dump_plans_r11.py <suffix> [name ...]

Writes plans/r11/<query>_<suffix>.txt for every headline query (or the
named queries) — the .explain("formatted") output the optimization
round's claims are checked against.
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or [n for n, q in REGISTRY.items() if q.headline]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("dump-plans-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = _REPO / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(name, "->", f"plans/r11/{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
