"""Corpus-frequency boilerplate segment removal (CCNet-style line dedup).

Web-curation pipelines (CCNet, RefinedWeb, MassiveText) drop LINES whose
corpus-wide frequency crosses a threshold — navigation bars, cookie
banners, license footers repeat near-verbatim across millions of pages,
and removing them is a whole-unit decision (the line goes or stays),
unlike the span-level Lee-et-al. removal in
``plans/queries_text.exact_substring_removal``. The fixture documents
are single-line token streams, so the line surrogate here is the
NON-OVERLAPPING fixed-width token segment (``seg_tokens`` whitespace
tokens, final partial segment kept); on real multi-line corpora the
segmenter is one ``split('\\n')`` swap away and every downstream stage
is unit-agnostic.

Extends the reference's per-row validation pattern (quality columns per
document, cf. the trace/morphology check batteries, SURVEY §2.9) the
same way the rest of the curation tier does: everything is built-in
Column expressions, reproducible in the DuckDB oracle.

Scale design (100 TB):
- Segmentation is a per-row ``transform`` over the token array — no
  shuffle, linear in corpus size, whole-stage-codegen'd.
- The frequency table groups on ``xxhash64(seg)`` — the 8-byte narrow
  exchange key (the exact_substring_removal precedent), partial-agg'd
  map-side, so the shuffle carries (hash, count) not segment text.
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


def _seg_col(tokens: Column, seg_id: Column, seg_tokens: int) -> Column:
    """Segment ``seg_id`` of the token array: tokens re-joined by a
    single space (the canonical form both engines digest)."""
    return F.array_join(
        F.slice(tokens, seg_id * seg_tokens + 1, seg_tokens), " "
    )


def doc_segments(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
) -> DataFrame:
    """Explode documents into non-overlapping ``seg_tokens``-token
    segments: ``(id_col, seg_id, seg)``, final partial segment kept.

    ``seg_id`` is the 0-based position of the segment within its
    document; every doc yields ``ceil(n_tokens / seg_tokens)`` segments
    (at least one — an empty OR NULL text is coalesced to '' and
    tokenizes to the single empty token under whitespace split, so no
    document ever vanishes from the removal report; the oracle
    mirrors with ``coalesce(text, '')``).
    """
    toks = docs.select(
        id_col,
        ws_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
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
    """Hashes of segments whose TOTAL occurrence count (within-doc
    repeats included — boilerplate repeats inside pages too) reaches
    ``min_df``. One narrow groupBy on the 8-byte xxhash64 key; output
    is bounded by ``total_segments / min_df``. Reuses an existing
    ``__h`` column when the caller already derived it (the persisted
    segments table in the removal paths) rather than re-hashing."""
    key = (
        F.col("__h")
        if "__h" in segments.columns
        else F.xxhash64("seg").alias("__h")
    )
    return (
        segments.groupBy(key)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_df)
        .select("__h")
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
) -> DataFrame:
    """Apply the removal: per document, drop every segment whose corpus
    frequency reaches ``min_df`` and certify the RESULT — segment
    counts plus an md5 digest of the cleaned, order-preserved text
    (hash-fails if even one segment survives or drops wrongly).

    Returns ``(id_col, n_segments, n_removed, cleaned_md5)`` with one
    row per input document (untouched and fully-emptied docs
    included; an emptied doc digests the empty string).
    """
    from .cache import bounded_persist

    _check_min_df(min_df)
    segs = bounded_persist(
        doc_segments(
            docs, text_col=text_col, id_col=id_col, seg_tokens=seg_tokens
        ).withColumn("__h", F.xxhash64("seg"))
    )
    heavy = heavy_segment_hashes(segs, min_df=min_df)
    return _removal_decisions(segs, heavy, id_col=id_col)


def _check_min_df(min_df: int) -> None:
    if min_df < 2:
        raise ValueError(
            f"min_df={min_df} would remove every segment (each occurs "
            "at least once) — boilerplate thresholds start at 2"
        )


def _removal_decisions(
    segs: DataFrame, heavy: DataFrame, *, id_col: str
) -> DataFrame:
    """Shared removal tail: anti-join the heavy set, reassemble kept
    segments per doc (sort by position, digest), emit one row per
    input document. ``segs`` must carry ``(id_col, seg_id, seg, __h)``;
    ``heavy`` is the single-column ``__h`` decision set."""
    kept = segs.join(heavy, "__h", "left_anti")
    cleaned = kept.groupBy(id_col).agg(
        F.count("*").alias("__n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_id", "seg"))),
                    lambda x: x["seg"],
                ),
                " ",
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
) -> DataFrame:
    """Mergeable frequency partial for the INCREMENTAL tier: the
    ``(__h, n)`` segment-count table of one corpus slice. Additive —
    the state a standing pipeline persists and folds batch deltas
    into (the operators/incremental partial_state convention)."""
    return (
        doc_segments(docs, text_col=text_col, id_col=id_col, seg_tokens=seg_tokens)
        .groupBy(F.xxhash64("seg").alias("__h"))
        .agg(F.count("*").alias("n"))
    )


def merge_frequency_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two frequency partials: union + re-sum. Exactly associative
    and commutative (integer counts), so folded == one-shot whatever
    the batch arrival order."""
    return a.unionByName(b).groupBy("__h").agg(F.sum("n").alias("n"))


def remove_boilerplate_incremental(
    new_docs: DataFrame,
    corpus_state: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
    min_df: int = 3,
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
    """
    from .cache import bounded_persist

    _check_min_df(min_df)
    segs_new = bounded_persist(
        doc_segments(
            new_docs, text_col=text_col, id_col=id_col, seg_tokens=seg_tokens
        ).withColumn("__h", F.xxhash64("seg"))
    )
    batch_state = segs_new.groupBy("__h").agg(F.count("*").alias("n"))
    merged = merge_frequency_states(corpus_state, batch_state)
    heavy = merged.filter(F.col("n") >= min_df).select("__h")
    return _removal_decisions(segs_new, heavy, id_col=id_col)
