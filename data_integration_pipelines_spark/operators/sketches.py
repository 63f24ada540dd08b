"""Count-min sketch over DataFrames — the mergeable frequency-estimate
partial that complements the HLL distinct-count partial
(operators/incremental.py) and the bloom membership bitmap
(operators/bloom.py) in the sketch family.

Representation: a (depth x width) counter grid as a plain DataFrame
``(d, bucket, cnt)`` — at most ``depth*width`` rows regardless of
corpus size. That makes every CMS operation a relational one:

- **build**: explode values, derive the ``depth`` (row, bucket) cells
  per value with one ``posexplode`` over a literal-range transform,
  groupBy (d, bucket) with map-side partial counts — ONE shuffle whose
  output is grid-sized, not corpus-sized.
- **merge**: union + SUM by (d, bucket) — CMS grids over disjoint
  batches add cell-wise, so a 1000-executor corpus builds partial
  grids per shard and folds them (the same mergeable-partials contract
  as incremental.partial_state).
- **estimate**: probe values join the grid on (d, bucket) and take
  MIN(cnt) over rows — the grid is tiny, so Spark broadcasts it; the
  probe side never shuffles.

Hashes are the repo's cross-engine md5 domain (``md5(d || ':' ||
value)`` -> first 8 hex digits -> bucket), so a DuckDB oracle rebuilds
the identical grid and the one-sided error guarantee
(estimate >= true count, overshoot <= eN/width w.h.p.) is checkable
exactly. No engine-native hash leaves the JVM/C++ boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(value: Column, d: int | Column, width: int) -> Column:
    """Bucket of ``value`` in hash row ``d``: first 8 md5 hex digits of
    ``d:value`` as an int, mod width. Deterministic and identically
    expressible in DuckDB (the split_assign/minhash hash convention)."""
    dcol = d if isinstance(d, Column) else F.lit(int(d))
    h = F.md5(F.concat(dcol.cast("string"), F.lit(":"), value.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _cells(df: DataFrame, value_col: str, width: int, depth: int, *extra: str) -> DataFrame:
    """One (d, bucket) row per hash row per input row — the shared
    explode behind build and estimate."""
    return df.select(
        *extra,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda d: cms_bucket(F.col(value_col), d, width),
            )
        ).alias("d", "bucket"),
    )


def cms_build(
    df: DataFrame, value_col: str, width: int = 64, depth: int = 3
) -> DataFrame:
    """Count-min grid (d, bucket, cnt, width, depth) over every row's
    value (bag semantics — duplicates count). One grid-sized shuffle.
    The (width, depth) columns are the grid's self-describing
    parameters: ``cms_estimate`` validates them against its own
    arguments, because probing a grid with a DIFFERENT width silently
    breaks the one-sided estimate>=truth guarantee (probe buckets miss
    the grid's cells and read 0)."""
    return (
        _cells(df, value_col, width, depth)
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select("*", F.lit(width).alias("width"), F.lit(depth).alias("depth"))
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Cell-wise sum of CMS grids built with the same (width, depth):
    CMS(A ++ B) == merge(CMS(A), CMS(B)) exactly."""
    it = iter(grids)
    out = next(it)
    for g in it:
        out = out.unionAll(g)
    # (width, depth) ride through the groupBy: merging grids of
    # DIFFERENT parameters yields multiple (width, depth) tuples,
    # which cms_estimate's validation rejects loudly
    return out.groupBy("d", "bucket", "width", "depth").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    grid: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = 64,
    depth: int = 3,
) -> DataFrame:
    """Point estimates for each probe value: MIN over the value's
    ``depth`` cells. Missing cells count 0 (an un-hit bucket means the
    value was never inserted). The grid is depth*width rows — Spark
    broadcasts it; the probe side stays shuffle-free."""
    meta = grid.select("width", "depth").distinct().collect()
    if len(meta) != 1 or (meta[0]["width"], meta[0]["depth"]) != (width, depth):
        raise ValueError(
            f"grid parameters {[(m['width'], m['depth']) for m in meta]} do "
            f"not match estimate arguments (width={width}, depth={depth}) — "
            "a mismatched probe silently underestimates, violating the "
            "one-sided CMS guarantee"
        )
    cells = _cells(probes, value_col, width, depth, value_col)
    return (
        cells.join(F.broadcast(grid.drop("width", "depth")), ["d", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
