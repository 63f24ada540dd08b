"""2-criteria skyline (Pareto front) without a dominance self-join.

``skyline_2d(df, minimize, maximize)``: rows not dominated by any other
row, where q dominates p iff q.minimize <= p.minimize AND
q.maximize >= p.maximize with strict inequality in at least one.
(Multi-criteria selection for corpus curation: e.g. documents
Pareto-optimal in vocabulary richness vs length. Skyline-in-Spark is
the subject of "Integration of Skyline Queries into Spark SQL",
EDBT 2023 — this is the DataFrame-native 2-d special case.)

The textbook formulation is a NOT EXISTS dominance self-join — a theta
join that Spark can only execute as a (banned-by-our-CI) nested-loop,
O(N²) at scale. For two criteria, dominance has sorted structure, so
the skyline reduces to three max-scans, all shuffle-light:

1. bucket rows by the minimized criterion (fixed-width ranges);
2. ``m0``: max of the maximized criterion over all LOWER buckets —
   a prefix-max over the per-bucket aggregate table, which has one row
   per bucket (tiny at any data scale) and broadcasts back;
3. ``m1``: max over same-bucket rows with strictly smaller minimize —
   a RANGE-frame running max, partitioned by bucket (parallel);
4. ``m2``: max over rows tied on minimize (a per-(bucket, minimize)
   aggregate window).

p survives iff m0 < p.max AND m1 < p.max AND m2 <= p.max: any q with
strictly smaller ``minimize`` dominates when its ``maximize`` >= p's
(strictness already satisfied), and a ``minimize``-tied q dominates
only when strictly higher on ``maximize``.

One shuffle on bucket (reused by both windows) + one tiny aggregate:
the same plan shape at 100 TB, with parallelism = number of buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = float("-inf")


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    bucket_width: int = 16,
) -> DataFrame:
    """Rows of ``df`` on the (min ``minimize``, max ``maximize``) Pareto
    front. Both criteria must be numeric and non-null."""
    b = df.withColumn("__bucket", F.floor(F.col(minimize) / bucket_width))

    per_bucket = b.groupBy("__bucket").agg(F.max(maximize).alias("__bmax"))
    w_prefix = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = per_bucket.select(
        "__bucket", F.max("__bmax").over(w_prefix).alias("__m0")
    )

    w_run = (
        Window.partitionBy("__bucket")
        .orderBy(minimize)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tie = Window.partitionBy("__bucket", minimize)

    annotated = (
        b.join(F.broadcast(prefix), "__bucket")
        .withColumn("__m1", F.max(maximize).over(w_run))
        .withColumn("__m2", F.max(maximize).over(w_tie))
    )
    mx = F.col(maximize)
    survives = (
        (F.coalesce(F.col("__m0"), F.lit(_NEG_INF)) < mx)
        & (F.coalesce(F.col("__m1"), F.lit(_NEG_INF)) < mx)
        & (F.col("__m2") <= mx)
    )
    return annotated.filter(survives).drop("__bucket", "__m0", "__m1", "__m2")
