"""Z-order (Morton) clustering for multi-column data skipping.

At 100 TB a scan's cost is decided before the first task runs: by how
many files/row-groups the parquet min/max statistics let the reader
SKIP. Sorting by one column gives perfect skipping on that column and
none on any other; interleaving the bits of the clustering columns
(the Morton curve) makes files contiguous in EVERY dimension, so a
predicate on any key — or a box over several — prunes most files from
the listing
alone. This is the layout trick behind Delta/Iceberg ``OPTIMIZE
ZORDER BY``, built here from plain Column expressions:

- rank-normalize each key to a bounded integer domain (``ntile`` over
  a window — rank, not value, so skew and outliers cannot collapse
  the curve),
- interleave the bits JVM-side (shift/or expression tree, whole-stage
  codegen — no UDF),
- range-repartition + sort by the z-value, write parquet.

The payoff is measurable without a cluster: every output file's
footer carries min/max for both keys spanning only a small fraction
of the global range (``zorder_stats``), where a single-column sort
spans ~100% on the second key. Extends the reference's per-bucket
layout (SURVEY §1.1) to multi-dimensional pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def z_value_n(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave D non-negative ints already in [0, 2^bits):
    bit i of column j lands at position i*D + j. Pure shift/or Column
    tree — stays in whole-stage codegen. D*bits must fit a long
    (<= 62)."""
    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits = {d * bits} > 62 z-bits")
    longs = [c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(longs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return z


def z_value(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """2-D Morton curve: bit i of ``col_a`` at 2i, of ``col_b`` at
    2i+1 (the D=2 case of ``z_value_n``)."""
    return z_value_n([col_a, col_b], bits)


#: row count above which ``method="auto"`` switches from the exact
#: ntile ranking (one global-window sort per key) to approx-quantile
#: bucketing (no global window anywhere in the plan)
ZORDER_AUTO_THRESHOLD = 10_000_000


def _zordered_ntile(
    df: DataFrame, cols: tuple[str, ...], bits: int, tie_breaker: str | None
) -> DataFrame:
    """Exact rank-normalization: ntile over one unpartitioned window
    per key (a distributed sort, not a collect — but every row passes
    through a single task per window, so this is the SMALL-table
    path)."""
    n_buckets = 1 << bits
    with_z = df
    rank_cols = []
    for idx, c in enumerate(cols):
        rc = f"__r{idx}"
        order = [F.col(c)] + [F.col(o) for o in cols if o != c]
        if tie_breaker is not None:
            order.append(F.col(tie_breaker))
        with_z = with_z.withColumn(
            rc, F.ntile(n_buckets).over(Window.orderBy(*order)) - 1
        )
        rank_cols.append(rc)
    return with_z.withColumn(
        "__z", z_value_n([F.col(rc) for rc in rank_cols], bits)
    ).drop(*rank_cols)


def _zordered_quantile(
    df: DataFrame, cols: tuple[str, ...], bits: int, relative_error: float
) -> DataFrame:
    """Scale path: rank-normalize via PRECOMPUTED approx-quantile range
    bounds instead of a global window. One Greenwald-Khanna sketch pass
    over the keys (``approxQuantile`` — mergeable map-side partials,
    ~(1/relative_error) numbers per key to the driver, never rows),
    then each row binary-searches its 2^bits bucket bounds JVM-side
    (``pyspark.ml.feature.Bucketizer``). NO single-partition stage
    anywhere: the only wide exchange in the plan is the final z-value
    range repartition, identical to the ntile path's output shuffle.

    Equal key values always land in the same bucket, so the layout is
    deterministic given the computed bounds; the bounds themselves are
    the sketch's — re-running on a differently-partitioned copy of the
    same rows may shift a bucket boundary by up to ``relative_error``
    of the rank range (layout-only drift; file contents never depend
    on it). Keys are sketched as doubles — integer keys above 2^53
    quantize (fine for bucketing: neighboring ids belong in the same
    bucket anyway)."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(n_buckets + 1)]
    as_double = df.select(
        *[F.col(c).cast("double").alias(f"__d{i}") for i, c in enumerate(cols)]
    )
    all_bounds = as_double.stat.approxQuantile(
        [f"__d{i}" for i in range(len(cols))], probs, relative_error
    )

    splits_array = []
    for bounds in all_bounds:
        finite = sorted({b for b in bounds if b == b})  # drop NaN, dedup
        splits = [float("-inf"), *finite, float("inf")]
        if len(splits) < 3:  # all-null key: one catch-all bucket pair
            splits = [float("-inf"), 0.0, float("inf")]
        splits_array.append(splits)

    in_cols = [f"__q{i}" for i in range(len(cols))]
    out_cols = [f"__b{i}" for i in range(len(cols))]
    staged = df.select(
        "*", *[F.col(c).cast("double").alias(ic) for c, ic in zip(cols, in_cols)]
    )
    bucketizer = Bucketizer(
        inputCols=in_cols,
        outputCols=out_cols,
        splitsArray=splits_array,
        handleInvalid="keep",  # null/NaN -> extra top bucket, clamped below
    )
    bucketed = bucketizer.transform(staged)
    # Re-scale each key's bucket index onto the FULL [0, 2^bits) range:
    # a low-cardinality key dedups to far fewer than 2^bits splits, and
    # left as-is its index would occupy only the LOW interleave bits —
    # the other key's high bits would then totally order the curve and
    # that dimension would go unpruned (observed: a 15-user key left
    # every file spanning 100% of users). floor(b * 2^bits / nb) spreads
    # nb real buckets across the high bits instead. The handleInvalid
    # bucket (one past the last interval) is clamped into the top real
    # bucket first.
    rank_cols = []
    for bc, splits in zip(out_cols, splits_array):
        nb = len(splits) - 1
        clamped = F.least(F.col(bc).cast("long"), F.lit(nb - 1))
        rank_cols.append(
            F.floor(clamped * F.lit(n_buckets) / F.lit(nb)).cast("long")
        )
    return bucketed.withColumn("__z", z_value_n(rank_cols, bits)).drop(
        *in_cols, *out_cols
    )


def zordered_df(
    df: DataFrame,
    *cols: str,
    n_files: int = 8,
    bits: int = 10,
    tie_breaker: str | None = None,
    method: str = "auto",
    relative_error: float = 0.001,
) -> DataFrame:
    """The z-ordered layout as a DataFrame (rows clustered into
    ``n_files`` range partitions sorted by the Morton value, z column
    dropped) — ``write_zordered`` minus the write, exposed so plans
    and tests can inspect the physical shape.

    ``method``: ``"ntile"`` = exact per-key rank via one global window
    per key; ``"quantile"`` = precomputed approx-quantile bounds +
    JVM-side bucket search, no global window in the plan (the petabyte
    path — an unpartitioned ntile window funnels every row through ONE
    task per key, which at 100 TB is the whole job serialized);
    ``"auto"`` (default) = ntile below ``ZORDER_AUTO_THRESHOLD`` rows,
    quantile above (one metadata-cheap count decides)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 clustering keys")
    if method not in ("auto", "ntile", "quantile"):
        raise ValueError(f"unknown z-order method {method!r}")
    if method == "auto":
        method = "quantile" if df.count() > ZORDER_AUTO_THRESHOLD else "ntile"
    if method == "ntile":
        with_z = _zordered_ntile(df, cols, bits, tie_breaker)
    else:
        with_z = _zordered_quantile(df, cols, bits, relative_error)
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    *cols: str,
    n_files: int = 8,
    bits: int = 10,
    tie_breaker: str | None = None,
    method: str = "auto",
    relative_error: float = 0.001,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton curve of ``cols`` (2 or more clustering keys).

    Keys are rank-normalized into [0, 2^bits) before interleaving, so
    arbitrary numeric/temporal domains and skewed distributions still
    spread evenly along the curve. See :func:`zordered_df` for the
    ``method`` knob: exact ``ntile`` ranking (small tables) vs
    approx-quantile bucketing (no global window — the petabyte path),
    auto-switched on a row-count threshold by default.

    On the ntile path each window carries a STABLE tie-break — the
    remaining clustering keys, then ``tie_breaker`` (pass a unique id
    column when rows can collide on every clustering key):
    ``Window.orderBy`` on a non-unique key alone gives
    partition-order-dependent ranks, and the produced file layout /
    ``zorder_stats`` fractions would vary run to run — off-tone for an
    engine whose contract is determinism everywhere else. (The
    quantile path needs no tie-break: equal values share a bucket by
    construction.)"""
    (
        zordered_df(
            df,
            *cols,
            n_files=n_files,
            bits=bits,
            tie_breaker=tie_breaker,
            method=method,
            relative_error=relative_error,
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_stats(path: str, *cols: str) -> list[dict]:
    """Per-file min/max coverage of every clustering key, straight from the
    parquet footers (what a reader's pruning actually sees). Returns
    one dict per data file with the fraction of the global range each
    file spans per column — the skipping power of the layout."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    per_file = []
    for frag in dataset.get_fragments():
        md = pq.ParquetFile(frag.path).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name not in cols or c.statistics is None:
                    continue
                st = c.statistics
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        per_file.append({"file": frag.path, "min": mins, "max": maxs})
    # a file whose footer lacks statistics for either key (all-null
    # chunk, stats disabled at write time) can't contribute to range
    # math — fail loudly instead of KeyError-ing mid-comprehension
    lacking = [
        f["file"]
        for f in per_file
        if not all(c in f["min"] and c in f["max"] for c in cols)
    ]
    if lacking:
        raise ValueError(
            f"parquet footer statistics missing for {cols!r} "
            f"in: {lacking[:3]}{'...' if len(lacking) > 3 else ''} — "
            "z-order pruning needs min/max stats on every clustering key"
        )
    # convert to global-range fractions
    g_min = {c: min(f["min"][c] for f in per_file) for c in cols}
    g_max = {c: max(f["max"][c] for f in per_file) for c in cols}
    out = []
    for f in per_file:
        row = {"file": f["file"]}
        for c in cols:
            span = g_max[c] - g_min[c]
            width = f["max"][c] - f["min"][c]
            row[f"{c}_frac"] = (
                float(width / span) if span else 0.0
            )
        out.append(row)
    return out


def file_stats(path: str) -> list[dict]:
    """Per-file (path, bytes, rows) for a parquet dataset — the input
    to any compaction decision."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    out = []
    for frag in ds.dataset(path, format="parquet").get_fragments():
        md = pq.ParquetFile(frag.path).metadata
        out.append(
            {
                "file": frag.path,
                "bytes": os.path.getsize(frag.path),
                "rows": md.num_rows,
            }
        )
    return out


def compact(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite a fragmented parquet dataset into ~target-size files —
    the small-files problem is the other half of the layout story
    (zorder fixes WHAT each file spans; compaction fixes HOW MANY
    files there are: a 100 TB table fragmented into 10 KB files spends
    its scan time on open/footer overhead and its driver memory on the
    file listing). File count = ceil(total_bytes / target); an
    optional sort restores clustering while rewriting. Returns
    before/after file stats."""
    import math

    before = file_stats(path)
    total = sum(f["bytes"] for f in before)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    after = file_stats(out_path)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes_total": total,
        "rows_total": sum(f["rows"] for f in before),
    }
