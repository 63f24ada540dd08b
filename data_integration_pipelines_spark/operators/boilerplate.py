"""Corpus-frequency boilerplate segment removal (CCNet-style line dedup).

Web-curation pipelines (CCNet, RefinedWeb, MassiveText) drop LINES whose
corpus-wide frequency crosses a threshold — navigation bars, cookie
banners, license footers repeat near-verbatim across millions of pages,
and removing them is a whole-unit decision (the line goes or stays),
unlike the span-level Lee-et-al. removal in
``plans/queries_text.exact_substring_removal``.

Two segmentation UNITS, selected by ``unit=``:

- ``"line"`` — the production unit: documents split on ``'\\n'``, each
  line one removal candidate (what CCNet/RefinedWeb actually dedup).
  Reassembly re-joins kept lines with ``'\\n'``.
- ``"segment"`` — the single-line surrogate: non-overlapping
  ``seg_tokens``-token windows (final partial kept), re-joined with a
  space. Retained as the differential twin for corpora without line
  structure (the fixture ``documents`` table is single-line).

Every downstream stage — frequency state, heavy-set decision, removal,
incremental fold, streaming delta — is unit-agnostic: only the splitter
and the reassembly separator differ.

Decision keys are the PAIR ``(xxhash64(seg), xxhash64(seg, 1))`` — 128
independent bits (the bloom-filter ``xxhash64(key, lit(i))`` salt
convention). A single 64-bit key at 100 TB (~10^13 segments) expects
~10^6 colliding pairs by the birthday bound, each silently deleting an
innocent segment that collided with a heavy one; the pair key drives
the expectation to ~10^-13 (~never) while the shuffle still carries 16
bytes + count, never segment text. The human-audit report
(:func:`segment_frequency_table`) additionally groups on the text
itself, so it is collision-proof outright.

Extends the reference's per-row validation pattern (quality columns per
document — the whole-unit accept/reject checks of
``src/trace/validation/validation.py:99-133``, cf. the trace/morphology
check batteries, SURVEY §2.9) the same way the rest of the curation
tier does: everything is built-in Column expressions, reproducible in
the DuckDB oracle.

Scale design (100 TB):
- Segmentation is a per-row ``transform``/``split`` over the document —
  no shuffle, linear in corpus size, whole-stage-codegen'd.
- The frequency table groups on the 16-byte hash pair — partial-agg'd
  map-side, so the shuffle carries (hashes, count) not segment text.
- The heavy set (``count >= min_df``) is SMALL by construction — at
  most ``total_segments / min_df`` rows and in practice the boilerplate
  vocabulary — so the decision join back to the corpus is an unhinted
  equi-join AQE sides at runtime (the semdedup_keep precedent: never a
  corpus-sized broadcast hint).
- Reassembly is one per-doc fold (sort kept segments by position,
  join, digest) — the same shape as the span-removal reassembly, one
  shuffle on doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_tokens

__all__ = [
    "doc_segments",
    "heavy_segment_hashes",
    "segment_frequency_table",
    "remove_boilerplate_segments",
    "segment_frequency_state",
    "merge_frequency_states",
    "remove_boilerplate_incremental",
]

#: reassembly separator per segmentation unit — the ONLY place the
#: units differ downstream of the splitter
_UNIT_SEPS = {"segment": " ", "line": "\n"}


def _check_unit(unit: str) -> None:
    if unit not in _UNIT_SEPS:
        raise ValueError(
            f"unit={unit!r}: expected one of {sorted(_UNIT_SEPS)}"
        )


def _seg_col(tokens: Column, seg_id: Column, seg_tokens: int) -> Column:
    """Segment ``seg_id`` of the token array: tokens re-joined by a
    single space (the canonical form both engines digest)."""
    return F.array_join(
        F.slice(tokens, seg_id * seg_tokens + 1, seg_tokens), " "
    )


def _with_hashes(segments: DataFrame) -> DataFrame:
    """Attach the 128-bit decision key: two independently-salted
    xxhash64 columns (see module docstring for the collision math)."""
    return segments.withColumn("__h", F.xxhash64("seg")).withColumn(
        "__h2", F.xxhash64("seg", F.lit(1))
    )


def doc_segments(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
    unit: str = "segment",
) -> DataFrame:
    """Explode documents into removal units: ``(id_col, seg_id, seg)``.

    ``unit="line"`` splits on ``'\\n'`` (the CCNet production unit; a
    document with no newline is its own single line — corpora with
    CRLF endings should normalize ``'\\r'`` away at ingest, or the
    carriage return rides into the line text and its hash);
    ``unit="segment"`` tiles the whitespace-token stream into
    non-overlapping ``seg_tokens``-token windows, final partial kept.

    ``seg_id`` is the 0-based position of the unit within its document;
    every doc yields at least one unit — an empty OR NULL text is
    coalesced to '' (one empty line / one empty token), so no document
    ever vanishes from the removal report; the oracle mirrors with
    ``coalesce(text, '')``.
    """
    _check_unit(unit)
    text = F.coalesce(F.col(text_col), F.lit(""))
    if unit == "line":
        return docs.select(
            id_col,
            F.posexplode(F.split(text, "\n", -1)).alias("seg_id", "seg"),
        )
    toks = docs.select(id_col, ws_tokens(text).alias("__t"))
    n_segs = F.ceil(F.size("__t") / F.lit(seg_tokens)).cast("int")
    return toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda s: _seg_col(F.col("__t"), s, seg_tokens),
            )
        ).alias("seg_id", "seg"),
    )


def heavy_segment_hashes(segments: DataFrame, *, min_df: int = 3) -> DataFrame:
    """Hash pairs of segments whose TOTAL occurrence count (within-doc
    repeats included — boilerplate repeats inside pages too) reaches
    ``min_df``. One narrow groupBy on the 16-byte hash-pair key; output
    is bounded by ``total_segments / min_df``. Reuses existing
    ``__h``/``__h2`` columns when the caller already derived them (the
    persisted segments table in the removal paths) rather than
    re-hashing; a frame carrying only ONE of the pair — e.g. a table
    persisted under the pre-r10 single-hash contract — raises a
    descriptive error instead of failing later with an
    unresolved-column groupBy (ADVICE r10)."""
    has_h, has_h2 = "__h" in segments.columns, "__h2" in segments.columns
    if has_h != has_h2:
        present, missing = ("__h", "__h2") if has_h else ("__h2", "__h")
        raise ValueError(
            f"segments frame carries {present} but not {missing}: the "
            "decision key is the 128-bit PAIR (xxhash64(seg), "
            "xxhash64(seg, 1)) since r10 — a frame built under the "
            "older single-hash contract must be re-derived with "
            "_with_hashes/doc_segments (drop the stale hash column "
            "and re-ingest; persisted (__h, n) frequency states are "
            "format-incompatible with the (__h, __h2, n) fold)"
        )
    if not has_h:
        segments = _with_hashes(segments)
    return (
        segments.groupBy("__h", "__h2")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_df)
        .select("__h", "__h2")
    )


def segment_frequency_table(
    segments: DataFrame,
    *,
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """The boilerplate REPORT: segment text, total occurrences, distinct
    documents — every segment at or above ``min_df`` total occurrences.

    Groups on (hash, text): the exchange is keyed by the narrow hash
    yet collision-proof, and the report needs the text anyway (this is
    the human-audit table, small by the same ``/ min_df`` bound).
    """
    return (
        segments.groupBy(F.xxhash64("seg").alias("__h"), "seg")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct(id_col).cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_df)
        .select("seg", "n_occurrences", "n_docs")
    )


def remove_boilerplate_segments(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
    min_df: int = 3,
    unit: str = "segment",
) -> DataFrame:
    """Apply the removal: per document, drop every segment whose corpus
    frequency reaches ``min_df`` and certify the RESULT — segment
    counts plus an md5 digest of the cleaned, order-preserved text
    (hash-fails if even one segment survives or drops wrongly).

    Returns ``(id_col, n_segments, n_removed, cleaned_md5)`` with one
    row per input document (untouched and fully-emptied docs
    included; an emptied doc digests the empty string). In
    ``unit="line"`` mode kept lines re-join with ``'\\n'`` before
    digesting, so the digest is of the actual cleaned document.
    """
    from .cache import bounded_persist

    _check_min_df(min_df)
    _check_unit(unit)
    segs = bounded_persist(
        _with_hashes(
            doc_segments(
                docs,
                text_col=text_col,
                id_col=id_col,
                seg_tokens=seg_tokens,
                unit=unit,
            )
        )
    )
    heavy = heavy_segment_hashes(segs, min_df=min_df)
    return _removal_decisions(segs, heavy, id_col=id_col, sep=_UNIT_SEPS[unit])


def _check_min_df(min_df: int) -> None:
    if min_df < 2:
        raise ValueError(
            f"min_df={min_df} would remove every segment (each occurs "
            "at least once) — boilerplate thresholds start at 2"
        )


def _removal_decisions(
    segs: DataFrame, heavy: DataFrame, *, id_col: str, sep: str = " "
) -> DataFrame:
    """Shared removal tail: anti-join the heavy set on the 128-bit
    hash pair, reassemble kept segments per doc (sort by position,
    join with ``sep``, digest), emit one row per input document.
    ``segs`` must carry ``(id_col, seg_id, seg, __h, __h2)``; ``heavy``
    is the two-column ``(__h, __h2)`` decision set."""
    kept = segs.join(heavy, ["__h", "__h2"], "left_anti")
    cleaned = kept.groupBy(id_col).agg(
        F.count("*").alias("__n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_id", "seg"))),
                    lambda x: x["seg"],
                ),
                sep,
            )
        ).alias("cleaned_md5"),
    )
    totals = segs.groupBy(id_col).agg(F.count("*").alias("__n_segments"))
    return (
        totals.join(cleaned, id_col, "left")
        .select(
            id_col,
            F.col("__n_segments").cast("bigint").alias("n_segments"),
            (F.col("__n_segments") - F.coalesce("__n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce("cleaned_md5", F.md5(F.lit(""))).alias("cleaned_md5"),
        )
    )


def segment_frequency_state(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
    unit: str = "segment",
) -> DataFrame:
    """Mergeable frequency partial for the INCREMENTAL tier: the
    ``(__h, __h2, n)`` segment-count table of one corpus slice.
    Additive — the state a standing pipeline persists and folds batch
    deltas into (the operators/incremental partial_state convention).

    STATE-FORMAT BREAK (r10): states persisted under the pre-r10
    single-hash contract — ``(__h, n)`` — are incompatible with this
    schema and with :func:`merge_frequency_states`; they cannot be
    upgraded in place (the second hash requires the segment text) and
    must be rebuilt from the corpus once."""
    _check_unit(unit)
    return (
        _with_hashes(
            doc_segments(
                docs,
                text_col=text_col,
                id_col=id_col,
                seg_tokens=seg_tokens,
                unit=unit,
            )
        )
        .groupBy("__h", "__h2")
        .agg(F.count("*").alias("n"))
    )


def merge_frequency_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two frequency partials: union + re-sum. Exactly associative
    and commutative (integer counts), so folded == one-shot whatever
    the batch arrival order. Both sides must be the r10 ``(__h, __h2,
    n)`` pair-key format — a pre-r10 ``(__h, n)`` state fails the
    unionByName here; rebuild it from the corpus (see
    :func:`segment_frequency_state`)."""
    return a.unionByName(b).groupBy("__h", "__h2").agg(F.sum("n").alias("n"))


def remove_boilerplate_incremental(
    new_docs: DataFrame,
    corpus_state: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
    min_df: int = 3,
    unit: str = "segment",
) -> DataFrame:
    """Daily-batch boilerplate removal against a standing corpus:
    decisions for the NEW documents only, using frequencies merged
    from the persisted ``corpus_state`` and the batch's own delta
    (the batch contributes to corpus frequency the moment it lands —
    one-shot parity requires counting it).

    The batch side is ingest-sized; the corpus is touched only through
    its (already aggregated, hash-keyed) frequency state — never
    re-segmented — which is what makes continuous line-dedup
    affordable where a full-corpus recount per batch is not.
    ``corpus_state`` must have been built with the SAME ``unit`` and
    ``seg_tokens`` (hash keys of different units never align).
    """
    from .cache import bounded_persist

    _check_min_df(min_df)
    _check_unit(unit)
    segs_new = bounded_persist(
        _with_hashes(
            doc_segments(
                new_docs,
                text_col=text_col,
                id_col=id_col,
                seg_tokens=seg_tokens,
                unit=unit,
            )
        )
    )
    batch_state = segs_new.groupBy("__h", "__h2").agg(F.count("*").alias("n"))
    merged = merge_frequency_states(corpus_state, batch_state)
    heavy = merged.filter(F.col("n") >= min_df).select("__h", "__h2")
    return _removal_decisions(
        segs_new, heavy, id_col=id_col, sep=_UNIT_SEPS[unit]
    )
