"""Temporal join operators Spark lacks natively: as-of join and
binned range join.

Both avoid the naive formulations that die at scale:

- **as-of join**: the textbook formulation is an inequality join
  (``l.ts >= r.ts``) + per-left-row max — a BroadcastNestedLoopJoin /
  cross product in Spark. This implementation is the union+window
  re-association used by time-series stores: tag both sides, union,
  ONE shuffle on the key, and ``last(..., ignorenulls)`` over the
  event-time order carries each right row forward to the left rows it
  matches. Cost is a sort within key partitions — no join node at all,
  and per-key data never concentrates on one task beyond what the
  window needs.
- **range join**: point-in-interval matching as an equi-join on
  integer bins — each interval registers on every bin it covers
  (bounded fan-out = interval width / bin size), each point probes its
  single bin, and an exact predicate verifies after the equi-join.
  Catalyst plans a hash join on the bin key instead of a nested loop.

The reference's pipelines are snapshot-batch (no temporal joins), so
these are engine extensions (SURVEY §2.10 spirit) — the operations a
training-data pipeline needs for point-in-time-correct feature
lookups ("the label must only see features known BEFORE the event").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of
    the LATEST right row with ``right.ts <= left.ts`` within the same
    ``by`` group (NULLs when none). Ties on ts match the right row
    (<=, ASOF semantics).

    ``right`` must be unique per (by, ts) — pre-aggregate if not.
    ``tolerance_us``: optionally NULL the payload when the matched
    right row is older than this many microseconds (requires the
    engine's tz-robust epoch helper; left and right must share the
    timestamp dtype).

    Returns all left columns + payload columns + ``__matched_ts``
    (the matched right timestamp, NULL when unmatched).
    """
    from ..functions.time import epoch_us_expr, ts_dtype

    by = list(by)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in by and c != ts_col]
    payload_cols = list(payload_cols)

    # Carry the matched right row as ONE struct, not per-column: with
    # independent last(ignorenulls) per payload column, a NULL field in
    # the latest right row would fall through to an OLDER right row's
    # value, stitching the output from different rows. A struct is
    # non-null as a unit even when its fields are NULL, so every
    # payload field (including genuine NULLs) comes from the same
    # matched row.
    r_struct = F.struct(
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    l_tag = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in by and c != ts_col],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != ts_col
        ],
        r_struct.alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal ts (__is_left asc), so
    # a tie matches; the running last(ignorenulls) is the as-of lookup
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c")
    )
    out = carried.filter(F.col("__is_left") == 1)

    if tolerance_us is not None:
        dtype = ts_dtype(left, ts_col)
        age = epoch_us_expr("__ts", dtype) - epoch_us_expr("__c.__r_ts", dtype)
        in_tol = F.col("__c").getField("__r_ts").isNotNull() & (age <= tolerance_us)
        out = out.withColumn("__c", F.when(in_tol, F.col("__c")))
    keep_payload = [F.col("__c").getField(c).alias(c) for c in payload_cols]
    matched_ts = F.col("__c").getField("__r_ts").alias("__matched_ts")

    left_cols = [c for c in left.columns if c not in by and c != ts_col]
    return out.select(
        *by,
        F.col("__ts").alias(ts_col),
        *left_cols,
        *keep_payload,
        matched_ts,
    )


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] | None = None,
    chunk_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Skew-robust as-of join: identical semantics to ``asof_join``, but
    the per-key window is split into TIME-RANGE CHUNKS so a Zipfian hot
    key spreads over (key, chunk) partitions instead of serializing one
    task. This is the remedy for the documented per-key-sequential
    cliff of the union+window formulation (SCALE.md): salting cannot
    help an ordered window, time chunking can.

    Mechanics (three bounded steps, no inequality join anywhere):
    1. chunk id = floor(epoch_us / chunk_width_us) on both sides;
    2. boundary carry: per (key, chunk) reduce the right side to its
       LATEST row (``max_by`` — one small table, |keys x active
       chunks|), then a window over that table hands every chunk the
       latest right row of any EARLIER chunk;
    3. per-(key, chunk) union+window exactly like ``asof_join``, with
       the carry row injected as a virtual right row sorted before the
       chunk's own rows.

    Pick ``chunk_width_us`` so a hot key's densest chunk fits one task
    comfortably (default 1 hour). Results are bit-identical to
    ``asof_join`` for any width (property-tested)."""
    from ..functions.time import epoch_us_expr, ts_dtype

    def _us(colname: str, dtype: str):
        # integer/double ts columns are already epoch-like units
        if dtype.startswith("timestamp"):
            return epoch_us_expr(colname, dtype)
        return F.col(colname).cast("bigint")

    by = list(by)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in by and c != ts_col]
    payload_cols = list(payload_cols)
    dtype = ts_dtype(left, ts_col)

    r_struct = F.struct(
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_us = _us(ts_col, dtype)
    chunk = F.floor(l_us / F.lit(chunk_width_us)).alias("__chunk")

    l_tag = left.select(
        *by,
        chunk,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__pos"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in by and c != ts_col],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *by,
        chunk,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__pos"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != ts_col
        ],
        r_struct.alias("__r"),
    )

    # per-(key, chunk) latest right row, then carry-forward: each chunk
    # sees the latest right row of any STRICTLY EARLIER chunk. Include
    # the left side's chunks (value NULL) so chunks with no right rows
    # still receive a carry.
    r_us = _us("__ts", ts_dtype(r_tag, "__ts"))
    chunk_latest = r_tag.groupBy(*by, "__chunk").agg(
        F.max_by("__r", r_us).alias("__latest")
    )
    l_chunks = l_tag.select(*by, "__chunk").distinct().withColumn(
        "__latest", F.lit(None).cast(r_struct_type)
    )
    per_chunk = (
        chunk_latest.unionByName(l_chunks)
        .groupBy(*by, "__chunk")
        .agg(F.max("__latest").alias("__latest"))
    )
    w_carry = (
        Window.partitionBy(*by)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        per_chunk.select(
            *by,
            "__chunk",
            F.last("__latest", ignorenulls=True).over(w_carry).alias("__r"),
        )
        .filter(F.col("__r").isNotNull())
        .select(
            *by,
            "__chunk",
            F.col("__r").getField("__r_ts").alias("__ts"),
            F.lit(0).alias("__pos"),  # sorts before every in-chunk row
            F.lit(0).alias("__is_left"),
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in by and c != ts_col
            ],
            F.col("__r"),
        )
    )

    unioned = l_tag.unionByName(r_tag).unionByName(carries.select(l_tag.columns))
    w = (
        Window.partitionBy(*by, "__chunk")
        .orderBy(F.col("__pos").asc(), F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.select(
            "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c")
        )
        .filter(F.col("__is_left") == 1)
    )
    left_cols = [c for c in left.columns if c not in by and c != ts_col]
    return out.select(
        *by,
        F.col("__ts").alias(ts_col),
        *left_cols,
        *[F.col("__c").getField(c).alias(c) for c in payload_cols],
        F.col("__c").getField("__r_ts").alias("__matched_ts"),
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``lo <= point < hi``) as a binned
    equi-join: every interval explodes onto the integer bins it covers
    (fan-out bounded by interval width / bin_width), every point maps
    to one bin, the equi-join on the bin key replaces the nested loop,
    and the exact range predicate verifies after the match.

    Pick ``bin_width`` near the typical interval width: fan-out stays
    O(1) per interval and each point probes exactly one hash bucket.
    ``how='left'`` keeps unmatched points (payload NULLs)."""
    lo_bin = F.floor(F.col(lo_col) / bin_width).cast("long")
    hi_bin = F.floor((F.col(hi_col) - 1e-12) / bin_width).cast("long")
    binned_ivals = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    binned_pts = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    cond = (
        (binned_pts["__bin"] == binned_ivals["__bin"])
        & (binned_pts[point_col] >= binned_ivals[lo_col])
        & (binned_pts[point_col] < binned_ivals[hi_col])
    )
    joined = binned_pts.join(binned_ivals, cond, how)
    return joined.drop(binned_pts["__bin"]).drop(binned_ivals["__bin"])
