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
from .dedup import spread

_GOPHER_TOP_NS = (2, 3, 4)
_GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)


def _gopher_sig_col(n: int) -> str:
    return (f"top_{n}gram_char_frac_e4" if n in _GOPHER_TOP_NS
            else f"dup_{n}gram_char_frac_e4")


def _charsum(arr: Column) -> Column:
    """Total char length of an array of strings (0 for empty)."""
    zero = F.lit(0).cast("long")
    return F.aggregate(arr, zero, lambda a, x: a + F.length(x))


def _dup_gram_mass(grams: Column) -> Column:
    """Duplicate-gram char mass of ONE document's gram stream:
    sum over repeated grams of (count-1) x char length — identically
    charsum(all grams) - charsum(distinct grams), three native array
    ops, no sort, no shuffle."""
    return _charsum(grams) - _charsum(F.array_distinct(grams))


def _run_starts(sg: Column) -> Column:
    """0-based positions where a run starts in a SORTED string array:
    i == 0 or sg[i] != sg[i-1]. ``sg`` MUST be a plain column
    reference, not an expression tree — it is captured inside HOF
    lambdas, where a non-trivial expression would be re-evaluated per
    element (an O(len^2) trap)."""
    return F.filter(
        F.transform(sg, lambda x, i: i),
        lambda i: (i == F.lit(0))
        | (F.element_at(sg, i + 1) != F.element_at(sg, i)),
    )


def _top_gram_mass(sg: Column, starts: Column) -> Column:
    """Top-gram char mass from a SORTED gram array and its run-start
    positions: occurrences x char length of the most frequent gram,
    count ties broken by the lexicographically largest gram — exactly
    ``max(struct(c, gram))`` (in ascending order an equal-count run
    later in the array carries the larger gram, and ``array_max`` on
    (c, g) structs compares c first). Empty stream -> 0. Like
    :func:`_run_starts`, both inputs must be plain column refs."""
    zero = F.lit(0).cast("long")
    ends = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(F.size(sg)),
    )
    runs = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            (e - s).cast("long").alias("c"),
            F.element_at(sg, s + 1).alias("g"),
        ),
    )
    m = F.array_max(runs)
    return F.when(F.size(sg) == 0, zero).otherwise(
        m["c"] * F.length(m["g"])
    )


def gopher_signals_frame(
    rep: DataFrame, _carry: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document Gopher repetition signals over a ``(doc_id, text)``
    frame (multi-line text). ``_carry`` threads extra input columns
    through every projection layer unchanged (appended after the
    signal columns) — the fused full-filter path carries ``text`` so
    the document-rule half can compute on the SAME per-row chain
    instead of re-deriving the corpus and joining (r12, guide §2.4).

    Plan shape (the 100 TB story): EVERY signal — line stats and all
    nine n-gram stats — is a pure per-row array expression, so the
    whole frame is a single shuffle-free map over the scan. The six
    dup-gram masses are charsum(grams) - charsum(distinct grams)
    (:func:`_dup_gram_mass`, no sort); the three top-gram masses sort
    their gram stream and take an ``array_max`` over run-length structs
    (:func:`_top_gram_mass`); per-row cost is O(L log L) in the doc's
    token count and nothing is sized by corpus or vocabulary anywhere.
    (Through r10 this exploded a (doc_id, n, gram) stream — ~9T rows
    for a T-token corpus — through two groupBys, a pivot and a join;
    the gram stats are per-document functions, so that entire
    4-exchange corpus-scale shuffle was removable, r11 guide §2.4.)

    Every signal is a pure function of the single document — no
    batchmates, no corpus state — which is what makes the streaming
    face (streaming/ingest.streaming_gopher_gate) exact under any feed
    partitioning.

    The input is :func:`~..operators.dedup.spread` first: the shingle
    build is the most expression-dense per-row kernel in the engine
    (~9 zip_with chains per doc), and a small corpus scanned from an
    unsplittable single-row-group parquet file would otherwise
    serialize all of it onto one core (measured 16.5 s -> 2.8 s on
    local[32] at sf0.1). At real scale the scan already carries >=
    parallelism partitions and spread is a no-op."""
    rep = spread(rep)
    ns = _GOPHER_TOP_NS + _GOPHER_DUP_NS
    lines = F.split(F.col("text"), "\n")
    dlines = F.array_distinct(lines)

    base = rep.select(
        "doc_id",
        F.length("text").cast("long").alias("total_chars"),
        F.size(lines).cast("long").alias("n_lines"),
        _charsum(lines).alias("line_chars"),
        F.size(dlines).cast("long").alias("n_distinct_lines"),
        _charsum(dlines).alias("distinct_line_chars"),
        ws_tokens(F.col("text")).alias("toks"),
        *_carry,
    )

    keep = [
        "doc_id",
        "n_lines",
        "total_chars",
        "line_chars",
        "n_distinct_lines",
        "distinct_line_chars",
        *_carry,
    ]
    # Four projection layers so every multiply-referenced or
    # HOF-captured intermediate (the gram arrays, the sorted arrays,
    # their run-start index arrays) is a PLAIN column reference where
    # it is consumed — an expression tree in those positions would be
    # re-evaluated per reference (or, inside a lambda, per element:
    # the O(len^2) trap _run_starts documents).
    grams = base.select(
        *keep,
        *[
            word_shingles(F.col("toks"), n).alias(f"g{n}")
            for n in _GOPHER_TOP_NS + _GOPHER_DUP_NS
        ],
    )
    sorted_grams = grams.select(
        *keep,
        *[
            F.array_sort(F.col(f"g{n}")).alias(f"sg{n}")
            for n in _GOPHER_TOP_NS
        ],
        *[
            _dup_gram_mass(F.col(f"g{n}")).alias(f"m{n}")
            for n in _GOPHER_DUP_NS
        ],
    )
    with_starts = sorted_grams.select(
        "*",
        *[
            _run_starts(F.col(f"sg{n}")).alias(f"st{n}")
            for n in _GOPHER_TOP_NS
        ],
    )
    masses = with_starts.select(
        *keep,
        *[
            _top_gram_mass(F.col(f"sg{n}"), F.col(f"st{n}")).alias(f"m{n}")
            for n in _GOPHER_TOP_NS
        ],
        *[F.col(f"m{n}") for n in _GOPHER_DUP_NS],
    )
    return masses.select(
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
            e4(F.col(f"m{n}") / F.col("total_chars")).alias(
                _gopher_sig_col(n)
            )
            for n in ns
        ],
        *_carry,
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


def gopher_filter_frame(sig: DataFrame, _carry: tuple[str, ...] = ()) -> DataFrame:
    """Threshold gate over :func:`gopher_signals_frame` output: keep
    flag, fail count, and the comma-joined failing rule names (fixed
    rule order). Pure codegen projection — the signals frame carries
    all the cost. ``_carry`` as in :func:`gopher_signals_frame`."""
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
        *_carry,
    )


# --- document-level rules (the non-repetition half of Table A1) -----

#: Gopher's required stop words: a doc must contain at least two.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: (rule name, reject predicate over the signal columns) — Table A1's
#: document-level cutoffs, in document order, integer/e4 domain:
#: word count in [50, 100000]; mean word length in [3, 10] chars;
#: symbol-to-word ratio (hash or ellipsis) <= 0.1; <=90% of lines
#: bullet-started; <=30% of lines ellipsis-ended; >=80% of words with
#: an alphabetic char; >=2 stop words.
GOPHER_DOC_RULES = (
    ("word_count", lambda c: (c["n_words"] < 50) | (c["n_words"] > 100_000)),
    ("mean_word_len",
     lambda c: (c["mean_word_len_e4"] < 30_000) | (c["mean_word_len_e4"] > 100_000)),
    ("symbol_ratio",
     lambda c: (c["hash_ratio_e4"] > 1000) | (c["ellipsis_ratio_e4"] > 1000)),
    ("bullet_lines", lambda c: c["bullet_line_frac_e4"] > 9000),
    ("ellipsis_lines", lambda c: c["ellipsis_line_frac_e4"] > 3000),
    ("alpha_words", lambda c: c["alpha_word_frac_e4"] < 8000),
    ("stop_words", lambda c: c["n_stop_hits"] < 2),
)

_BULLET_PREFIXES = ("- ", "• ", "* ")


def gopher_doc_rules_frame(
    docs: DataFrame, _carry: tuple[str, ...] = ()
) -> DataFrame:
    """Document-level Gopher signals + gate over ``(doc_id, text)``:
    the non-repetition half of Table A1 (word-count bounds, mean word
    length, symbol-to-word ratio for '#' and '...', bullet-started and
    ellipsis-ended line fractions, alphabetic-word fraction, required
    stop words).

    Pure per-row array/string expressions — ZERO shuffle at any corpus
    size (the strongest scale shape in the module: a codegen map over
    the scan). Every count is an exact integer; ratios emit as e4
    BIGINTs from one IEEE division, so the DuckDB oracle matches by
    hash. The input is spread first (see :func:`gopher_signals_frame`)
    so the per-token regex/array filters parallelize off an
    unsplittable small scan; no-op at real scale."""
    docs = spread(docs)
    toks = ws_tokens(F.coalesce(F.col("text"), F.lit("")))
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
    zero = F.lit(0).cast("long")
    n_words = F.size(toks).cast("long")
    n_lines = F.size(lines).cast("long")
    tok_chars = F.aggregate(toks, zero, lambda a, x: a + F.length(x))
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ell = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / F.lit(3)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, 1, 2).isin(*_BULLET_PREFIXES),
        )
    ).cast("long")
    ell_end = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("long")
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    stops = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
            lambda s: F.array_contains(toks, s),
        )
    ).cast("long")
    sig = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        e4(tok_chars / n_words).alias("mean_word_len_e4"),
        e4(n_hash / n_words).alias("hash_ratio_e4"),
        e4(n_ell / n_words).alias("ellipsis_ratio_e4"),
        e4(bullet / n_lines).alias("bullet_line_frac_e4"),
        e4(ell_end / n_lines).alias("ellipsis_line_frac_e4"),
        e4(alpha / n_words).alias("alpha_word_frac_e4"),
        stops.alias("n_stop_hits"),
        *_carry,
    )
    cols = {f.name: F.col(f.name) for f in sig.schema.fields}
    flags = [
        F.when(pred(cols), F.lit(name)) for name, pred in GOPHER_DOC_RULES
    ]
    arr = F.array(*flags)
    n_fails = F.size(F.filter(arr, lambda x: x.isNotNull()))
    return sig.select(
        "*",
        n_fails.cast("long").alias("n_fails"),
        (n_fails == 0).alias("keep"),
        F.concat_ws(",", arr).alias("fail_rules"),
    )


def gopher_full_filter_frame(docs: DataFrame) -> DataFrame:
    """The COMPLETE Gopher quality filter: repetition rules + document
    rules over the same ``(doc_id, text)`` corpus, one verdict per doc.

    Plan (r12, guide §2.4): BOTH halves are pure per-row functions of
    the same document, so the whole filter is ONE fused shuffle-free
    projection chain — the repetition gate's layers carry ``text``
    through (``_carry``) and the document-rule signals compute on the
    SAME rows, where through r11 the halves re-derived the corpus
    independently and met in a doc_id-keyed join (2 hash Exchanges +
    a sort-merge join of two full corpus maps, at ANY scale).
    ``fail_rules`` lists repetition rules first, then document rules —
    fixed order across both halves. Spread once here; the halves' own
    spread calls no-op on the already-parallel frame."""
    docs = spread(docs)
    rep = gopher_filter_frame(
        gopher_signals_frame(docs, _carry=("text",)), _carry=("text",)
    ).select(
        "doc_id",
        "text",
        F.col("n_fails").alias("rep_n_fails"),
        F.col("fail_rules").alias("rep_fail_rules"),
    )
    fused = gopher_doc_rules_frame(
        rep, _carry=("rep_n_fails", "rep_fail_rules")
    ).select(
        "doc_id",
        "rep_n_fails",
        "rep_fail_rules",
        F.col("n_fails").alias("doc_n_fails"),
        F.col("fail_rules").alias("doc_fail_rules"),
    )
    n_fails = (F.col("rep_n_fails") + F.col("doc_n_fails")).cast("long")
    return fused.select(
        "doc_id",
        "rep_n_fails",
        "doc_n_fails",
        n_fails.alias("n_fails"),
        (n_fails == 0).alias("keep"),
        F.concat_ws(
            ",",
            F.filter(
                F.array(F.col("rep_fail_rules"), F.col("doc_fail_rules")),
                lambda x: x != "",
            ),
        ).alias("fail_rules"),
    )
