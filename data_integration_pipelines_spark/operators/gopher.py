"""Gopher/MassiveText repetition quality rules (Rae et al. 2021,
arXiv:2112.11446 Table A1): per-document repetition signals and the
published-threshold gate.

Documents dominated by repeated lines or repeated n-grams are
extraction failures (menus, SEO spam, crawler traps); the published
filter removes them with simple per-document fractions. Like the CCNet
tier (operators/ngram_lm.py), the mechanism is public and exactly
recomputable, so every signal emits as an oracle-checked e4 integer
(functions/quantize.py) — the registered queries in
plans/queries_text.py pair each with a full DuckDB oracle.

Definitions (documented variants of Gopher's prose, chosen to be
exactly integer-computable on both engines):

- ``dup_line_frac``      = (n_lines - n_distinct_lines) / n_lines
- ``dup_line_char_frac`` = (line_chars - distinct_line_chars) / line_chars
- ``top_{n}gram_char_frac`` (n=2,3,4): count(top gram) * chars(top
  gram) / total_chars, top = max occurrences, ties broken by greatest
  gram text (the same deterministic rule on both engines)
- ``dup_{n}gram_char_frac`` (n=5..10): sum over grams occurring >1 of
  (count-1) * chars(gram) / total_chars — the occurrence-mass form
  (Gopher's fine print measures span coverage; the occurrence form is
  the one reproductions like RedPajama-v2 / NeMo-Curator compute, is
  monotone in the same failure modes, and needs no span union).

Extends the reference's per-row validation-battery pattern (cf. ref
src/trace/validation/validation.py:208-376 — named checks emitting
per-item verdict columns) to corpus-level repetition hygiene.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import e4
from ..functions.text import word_shingles, ws_tokens

_GOPHER_TOP_NS = (2, 3, 4)
_GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)


def _gopher_sig_col(n: int) -> str:
    return (f"top_{n}gram_char_frac_e4" if n in _GOPHER_TOP_NS
            else f"dup_{n}gram_char_frac_e4")


def gopher_signals_frame(rep: DataFrame) -> DataFrame:
    """Per-document Gopher repetition signals over a ``(doc_id, text)``
    frame (multi-line text).

    Plan shape (the 100 TB story): line stats are pure per-row array
    expressions — zero shuffle. The n-gram side builds all nine gram
    streams array-side (``word_shingles``, zip_with of shifted slices)
    and explodes ONCE into a (doc_id, n, gram) stream of ~9T rows for
    a T-token corpus, then: one combiner-friendly groupBy on
    (doc_id, n, gram) — partial counts collapse duplicates map-side —
    one doc_id,n reduction (max-struct top + summed dup mass, both
    partial-agg friendly), one doc_id pivot, and one doc_id-keyed join
    back to the per-row stats. Every aggregation is associative; no
    window, no driver loop, nothing sized by vocabulary on any single
    node. Per-row cost is linear in doc length (the shingle arrays are
    slices, not materialized cross-products).

    Every signal is a pure function of the single document — no
    batchmates, no corpus state — which is what makes the streaming
    face (streaming/ingest.streaming_gopher_gate) exact under any feed
    partitioning."""
    ns = _GOPHER_TOP_NS + _GOPHER_DUP_NS
    lines = F.split(F.col("text"), "\n")
    dlines = F.array_distinct(lines)
    zero = F.lit(0).cast("long")

    def charsum(arr: Column) -> Column:
        return F.aggregate(arr, zero, lambda a, x: a + F.length(x))

    base = rep.select(
        "doc_id",
        F.length("text").cast("long").alias("total_chars"),
        F.size(lines).cast("long").alias("n_lines"),
        charsum(lines).alias("line_chars"),
        F.size(dlines).cast("long").alias("n_distinct_lines"),
        charsum(dlines).alias("distinct_line_chars"),
        ws_tokens(F.col("text")).alias("toks"),
    )

    def _tag(n: int):
        # NB: a closure factory, not a default-arg lambda — F.transform
        # dispatches on lambda ARITY, so `lambda g, n=n` would be called
        # as (element, index) and bind n to the position index.
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    occ = base.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.array(*[
                    F.transform(word_shingles(F.col("toks"), n), _tag(n))
                    for n in ns
                ])
            )
        ).alias("o"),
    ).select("doc_id", F.col("o.n").alias("n"), F.col("o.gram").alias("gram"))
    pern = (
        occ.groupBy("doc_id", "n", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n")
        .agg(
            F.max(F.struct(F.col("c"), F.col("gram"))).alias("top"),
            F.sum(
                F.when(
                    F.col("c") > 1, (F.col("c") - 1) * F.length("gram")
                ).otherwise(F.lit(0))
            ).alias("dup_mass"),
        )
        .select(
            "doc_id",
            "n",
            (F.col("top.c") * F.length(F.col("top.gram"))).alias("top_mass"),
            "dup_mass",
        )
    )
    piv = pern.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    F.col("top_mass") if n in _GOPHER_TOP_NS else F.col("dup_mass"),
                )
            ).alias(f"m{n}")
            for n in ns
        ]
    )
    sig = base.drop("toks").join(piv, "doc_id", "left")
    return sig.select(
        "doc_id",
        "n_lines",
        "total_chars",
        e4(
            (F.col("n_lines") - F.col("n_distinct_lines")) / F.col("n_lines")
        ).alias("dup_line_frac_e4"),
        e4(
            (F.col("line_chars") - F.col("distinct_line_chars"))
            / F.col("line_chars")
        ).alias("dup_line_char_frac_e4"),
        *[
            e4(
                F.coalesce(F.col(f"m{n}"), F.lit(0)) / F.col("total_chars")
            ).alias(_gopher_sig_col(n))
            for n in ns
        ],
    )


#: (rule name, signal column, e4 threshold) — Gopher Table A1's
#: published cutoffs, in document order; a doc failing ANY rule drops.
GOPHER_RULES = (
    ("dup_line", "dup_line_frac_e4", 3000),
    ("dup_line_char", "dup_line_char_frac_e4", 2000),
    ("top_2gram", "top_2gram_char_frac_e4", 2000),
    ("top_3gram", "top_3gram_char_frac_e4", 1800),
    ("top_4gram", "top_4gram_char_frac_e4", 1600),
    ("dup_5gram", "dup_5gram_char_frac_e4", 1500),
    ("dup_6gram", "dup_6gram_char_frac_e4", 1400),
    ("dup_7gram", "dup_7gram_char_frac_e4", 1300),
    ("dup_8gram", "dup_8gram_char_frac_e4", 1200),
    ("dup_9gram", "dup_9gram_char_frac_e4", 1100),
    ("dup_10gram", "dup_10gram_char_frac_e4", 1000),
)


def gopher_filter_frame(sig: DataFrame) -> DataFrame:
    """Threshold gate over :func:`gopher_signals_frame` output: keep
    flag, fail count, and the comma-joined failing rule names (fixed
    rule order). Pure codegen projection — the signals frame carries
    all the cost."""
    flags = [
        F.when(F.col(col) > F.lit(thr), F.lit(name))
        for name, col, thr in GOPHER_RULES
    ]
    arr = F.array(*flags)
    n_fails = F.size(F.filter(arr, lambda x: x.isNotNull()))
    return sig.select(
        "doc_id",
        *[F.col(col) for _, col, _ in GOPHER_RULES],
        n_fails.cast("long").alias("n_fails"),
        (n_fails == 0).alias("keep"),
        F.concat_ws(",", arr).alias("fail_rules"),
    )
