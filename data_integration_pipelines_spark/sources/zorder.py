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


def write_zordered(
    df: DataFrame,
    path: str,
    *cols: str,
    n_files: int = 8,
    bits: int = 10,
    tie_breaker: str | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton curve of ``cols`` (2 or more clustering keys).

    Keys are rank-normalized into [0, 2^bits) with ``ntile`` before
    interleaving, so arbitrary numeric/temporal domains and skewed
    distributions still spread evenly along the curve. One shuffle
    (the range repartition); the z column is dropped before writing.

    Each ntile window carries a STABLE tie-break — the remaining
    clustering keys, then ``tie_breaker`` (pass a unique id column
    when rows can collide on every clustering key): ``Window.orderBy``
    on a non-unique key alone gives partition-order-dependent ranks,
    and the produced file layout / ``zorder_stats`` fractions would
    vary run to run — off-tone for an engine whose contract is
    determinism everywhere else.

    Scale note: ntile needs a total order per key — computed with a
    single window over the key only (no partitioning), which is a
    sort, not a collect; for petabyte inputs swap in approx quantile
    bucketing (``F.ntile`` -> precomputed range bounds) with the same
    downstream layout.
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 clustering keys")
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
    with_z = with_z.withColumn(
        "__z", z_value_n([F.col(rc) for rc in rank_cols], bits)
    ).drop(*rank_cols)
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
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
