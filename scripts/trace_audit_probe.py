"""Head-to-head against the reference's ONLY published timing.

BASELINE.md: the reference's trace quality audit measures 0.440 s per
trace (21.997 s for ~50 traces, multiprocessing.Pool, one bucket —
ref src/trace/validation/validation.py:94). This probe synthesizes a
nested-resource corpus the size of the reference's LARGEST production
bucket (bbp/ionchannel, 58,809 traces — BASELINE.md corpus table),
runs the full EP1 audit (trace_audit + bucket_error_report), and
prints rows/s next to the reference's 2.27 rows/s.

The gap is structural, not tuning: the reference re-fetches each
resource over HTTP and loops checks in Python; here the checks are
whole-stage-codegen'd Column expressions over an in-memory frame, so
the audit is scan-bound. This is SURVEY §3 EP1's "Spark shape" claim,
measured.

Usage: python scripts/trace_audit_probe.py [n_rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_integration_pipelines_spark.pipelines import (  # noqa: E402
    bucket_error_report,
    trace_audit,
)
from data_integration_pipelines_spark.session import get_spark  # noqa: E402

_REF_S_PER_TRACE = 0.440  # validation.py:94


def synth_traces(spark, n: int):
    """Distributed synthesis of nested trace resources with realistic
    irregularities: ~10% deprecated, ~25% missing description, ~20%
    null subject, ~15% empty distribution, mixed curation labels."""
    base = spark.range(n).withColumnRenamed("id", "i")
    label = F.when(F.col("i") % 3 == 0, "Curated").otherwise("Unassessed")
    ext = F.when(F.col("i") % 5 == 0, ".abf").otherwise(".nwb")
    return base.select(
        F.concat(F.lit("trace-"), F.col("i")).alias("id"),
        F.concat(F.lit("org/bucket"), (F.col("i") % 7)).alias("bucket"),
        (F.col("i") % 10 == 0).alias("_deprecated"),
        F.when(F.col("i") % 4 != 0, F.concat(F.lit("desc "), F.col("i"))).alias(
            "description"
        ),
        F.array(
            F.struct(F.struct(label.alias("label")).alias("hasBody"))
        ).alias("annotation"),
        F.when(
            F.col("i") % 5 != 0, F.struct(F.lit("Mouse").alias("species"))
        ).alias("subject"),
        F.when(
            F.col("i") % 7 != 0,
            F.array(
                F.struct(
                    F.concat(F.col("i"), ext).alias("name"),
                    F.lit("application/nwb").alias("encodingFormat"),
                    F.when(
                        F.col("i") % 11 != 0,
                        F.concat(F.lit("https://store/f"), F.col("i")),
                    ).alias("contentUrl"),
                )
            ),
        ).alias("distribution"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 58_809
    spark = get_spark("trace-audit-probe")
    spark.sparkContext.setLogLevel("ERROR")
    traces = synth_traces(spark, n)
    traces.persist().count()  # materialize input outside the timer

    t0 = time.time()
    audit = trace_audit(traces)
    audit.write.format("noop").mode("overwrite").save()
    per_row_report = round(time.time() - t0, 3)

    t0 = time.time()
    bucket_error_report(trace_audit(traces)).write.format("noop").mode(
        "overwrite"
    ).save()
    rollup_s = round(time.time() - t0, 3)

    audited = audit.count()
    rows_per_s = audited / per_row_report if per_row_report else float("inf")
    print(
        f"traces={n} audited={audited} (deprecated dropped)\n"
        f"per-row audit: {per_row_report}s ({rows_per_s:,.0f} rows/s)\n"
        f"audit+bucket rollup: {rollup_s}s\n"
        f"reference: {_REF_S_PER_TRACE} s/trace = {1 / _REF_S_PER_TRACE:.2f} rows/s "
        f"(validation.py:94) -> speedup ~{rows_per_s * _REF_S_PER_TRACE:,.0f}x"
    )


if __name__ == "__main__":
    main()
