"""Equi-depth (quantile) binning with a scale-aware cut strategy.

Mirrors the z-order auto-method precedent (sources/zorder.py): exact
``percentile`` below a row threshold — a full per-column sort, the
right answer while it is cheap and the oracle-pinnable one — and
``approx_percentile`` (Greenwald-Khanna epsilon-sketch: fixed-size,
mergeable map-side, one pass) above it, where the exact percentile's
sort is the job's cost ceiling. One metadata-cheap count decides.

The cut points fold in as a LATERAL scalar subquery, never a join
node: a 1-row broadcast crossJoin would plan a
BroadcastNestedLoopJoin, which the plan gate forbids
(tests/test_plan_quality.py).

The approx path ships with a RANK-ERROR CERTIFICATE
(``quartile_mass_certificate``): each bin's mass must sit within 1%
rank of the ideal quarter — checked with exact integer arithmetic
(|100*n - 25*total| <= total), 100x looser than the sketch's
configured eps=1e-4, the approx_quantile_check pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: above this row count ``method='auto'`` switches the cuts to the
#: one-pass mergeable sketch (the exact path is a full sort per call)
EXACT_QUANTILE_THRESHOLD = 10_000_000


def with_quartile_bin(
    spark: SparkSession,
    view: str,
    value_col: str,
    method: str = "auto",
    accuracy: int = 10000,
    threshold: int = EXACT_QUANTILE_THRESHOLD,
) -> DataFrame:
    """All rows of ``view`` with a ``bin`` column in
    {p00_25, p25_50, p50_75, p75_100} from quartile cuts of
    ``value_col``. ``method``: exact | approx | auto (count decides).

    NULL ``value_col`` rows get bin='null' (ADVICE r7): both
    ``percentile`` and ``approx_percentile`` EXCLUDE NULLs from the
    cuts, so letting NULLs fall through the ``<`` comparisons into the
    ELSE branch would silently inflate p75_100 on NULL-heavy columns
    and falsify the rank-mass certificate. The certificate checks the
    four quartile bins against the NON-NULL total."""
    if method not in ("auto", "exact", "approx"):
        raise ValueError(f"unknown quantile method {method!r}")
    if method == "auto":
        method = (
            "exact" if spark.table(view).count() <= threshold else "approx"
        )
    # ONE aggregate call with the percentage ARRAY: three separate
    # percentile(col, p) calls each buffer (and, exact-path, sort) the
    # full non-null column independently — 3x the aggregation state and
    # 3x the sort for byte-identical cut values (r11, guide §1.3:
    # percentile(col, array(..)) returns all cuts from a single
    # buffer/sketch). Same SQL semantics, same IEEE interpolation, so
    # the oracle comparison is unchanged.
    if method == "exact":
        # frequency form: pre-aggregate to (value, count) with the
        # codegen'd hash aggregate, then feed percentile its frequency
        # argument — the UDAF builds the identical value->count map
        # and interpolates identically (verified bit-equal), but the
        # heavy per-row accumulation runs map-side partial-agg'd
        # instead of inside the single-reducer UDAF buffer, and the
        # exchange carries one row per DISTINCT value (r11, guide
        # §2.3 "aggregate before you shuffle"). Measured 3.8 -> 3.0 s
        # on a 600k-row near-all-distinct column; the win grows with
        # duplicate mass at any scale.
        q = (
            f"SELECT percentile(__v, array(0.25, 0.50, 0.75), __n) "
            f"FROM (SELECT {value_col} AS __v, count(*) AS __n "
            f"FROM {view} WHERE {value_col} IS NOT NULL "
            f"GROUP BY {value_col})"
        )
    else:
        q = (
            f"SELECT approx_percentile({value_col}, "
            f"array(0.25, 0.50, 0.75), {accuracy}) FROM {view}"
        )
    return spark.sql(
        f"""
        SELECT *, CASE WHEN {value_col} IS NULL THEN 'null'
                       WHEN {value_col} < qa[0] THEN 'p00_25'
                       WHEN {value_col} < qa[1] THEN 'p25_50'
                       WHEN {value_col} < qa[2] THEN 'p50_75'
                       ELSE 'p75_100' END AS bin
        FROM {view},
             LATERAL (SELECT ({q}) AS qa)
        """
    )


def quartile_mass_certificate(binned: DataFrame) -> DataFrame:
    """Per-bin rank-error certificate over a ``with_quartile_bin``
    result: mass_within_1pct_rank = |100*n - 25*total| <= total,
    exact integer arithmetic (no float share drift). The GK sketch
    guarantees each CUT within eps rank, so each bin's mass is within
    2*eps of a quarter — at the configured eps=1e-4 the 1% assertion
    has 50x headroom, yet any broken sketch/binning turns it false.
    The 'null' bin (NULL value_col rows) is excluded: the cuts are
    computed over non-null values only, so the quartile-mass contract
    is against the non-null total."""
    from pyspark.sql.window import Window

    per_bin = binned.filter(F.col("bin") != "null").groupBy("bin").agg(
        F.count("*").alias("n")
    )
    # bins-sized table (4 rows) — the unpartitioned window is bounded
    total = F.sum("n").over(Window.partitionBy())
    return per_bin.select(
        "bin",
        total.cast("bigint").alias("n_total"),
        (F.abs(F.col("n") * 100 - total * 25) <= total).alias(
            "mass_within_1pct_rank"
        ),
    )
