"""Hashed bigram language-model scoring — CCNet's quality tier.

CCNet (Wenzek et al. 2020) gates crawl documents on the perplexity of
a small LM trained on the TARGET corpus (Wikipedia): fluent text
scores low-perplexity, boilerplate/gibberish high. This module is the
distributed, oracle-exact recast: an add-one-smoothed BIGRAM model
over HASHED feature buckets, fit on a target subset, scoring every
document with the exact integer sum of its bigrams' e4 log-probs.

Distinct from ``operators/dsir.py`` by contract: DSIR scores the
importance RATIO between two corpora (domain selection); this scores
absolute fluency under one target model (quality gating). The two are
adjacent pipeline stages in production crawls.

Model structure (everything integer / md5-domain, the repo's
cross-engine conventions):

- event = adjacent token pair; context bucket ``b1 =
  md5(w1) % ctx_buckets``, pair bucket ``b12 = md5('w1 w2') %
  pair_buckets`` (the md5-hex domain — engine-portable).
- conditional probability, add-one smoothed over the PAIR bucket
  space: ``P(b12 | b1) = (c12 + 1) / (c1 + pair_buckets)`` where
  ``c1 = sum of c12 over the context`` — so for every context the
  probabilities sum to exactly 1 over the pair-bucket space
  (normalization pinned by pytest in integer arithmetic).
- unseen pair under a SEEN context: ``ln(1 / (c1 + pair_buckets))``
  (the context's own smoothed floor); unseen context: the global
  floor ``ln(1 / pair_buckets)``. Cross-corpus scoring (fit on
  target, score the crawl) hits both defaults — the contract never
  drops a document or an event.

Per-language models (``key_cols``): CCNet fits ONE LM PER LANGUAGE
(Wikipedia-lang as the target) and scores each shard under its own
model — a global en-target model ranks non-en shards by "how
en-like", not by fluency. Passing ``key_cols=("lang",)`` keys both
model tables by language: the fit groupBy gains the key, the model
stays bounded BY CONSTRUCTION at ``n_lang * ctx_buckets *
pair_buckets`` rows (languages are an enum, not data-sized — still
an honest broadcast), and scoring joins events to the model of the
event's own language. A language absent from the fit corpus scores
entirely through the global floor — the same never-drop contract.

Scale design (100 TB):
- The event stream is the DSIR bigram construction: ``zip_with`` of
  two shifted ``slice`` views, one explode — per-row, shuffle-free.
- The pair model is bounded BY CONSTRUCTION at ``ctx_buckets *
  pair_buckets`` rows (64*1024 default = 65,536) regardless of corpus
  size, the context table at ``ctx_buckets`` — both ride honest
  ``F.broadcast`` joins (the DSIR/decontaminate bounded-model
  precedent).
- Per-doc scoring is one groupBy(doc) integer sum of e4 BIGINTs —
  order-independent at any parallelism, never a float reduction.

Reference anchor: extends the reference's per-row scoring/validation
pattern (metric columns per resource, e.g.
``src/trace/validation/validation.py:99-133``, SURVEY §2.9) to
corpus-level language-model quality gating, the same recast the DSIR
and boilerplate tiers made for selection and line dedup.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import quantized
from ..functions.text import ws_tokens
from .cache import bounded_persist
from .dsir import token_bucket_col as _bucket  # same md5-domain rule

__all__ = [
    "bigram_events",
    "ngram_lm_fit",
    "ngram_lm_scores",
    "global_floor_e4",
]

#: add-one smoothing, fixed across engines (the DSIR ALPHA precedent)
ALPHA = 1
CTX_BUCKETS = 64
PAIR_BUCKETS = 1024


def global_floor_e4(pair_buckets: int = PAIR_BUCKETS) -> int:
    """e4(ln(1/pair_buckets)) — the unseen-CONTEXT default, computed
    once in Python with the exact ``quantized`` semantics (sign *
    floor(|x|*1e4 + 0.5)) so the literal matches both engines."""
    x = math.log(1.0 / pair_buckets)
    return int(math.copysign(math.floor(abs(x) * 10000 + 0.5), x))


def bigram_events(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_buckets: int = CTX_BUCKETS,
    pair_buckets: int = PAIR_BUCKETS,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """One row per adjacent token pair: ``(id_col, [extras,] b1,
    b12)``. Built array-side (zip_with of shifted slices -> one
    explode) — per-row, shuffle-free; a doc with < 2 tokens emits no
    events (its score is the empty sum, pinned by the every-doc left
    join in :func:`ngram_lm_scores`)."""
    toks = ws_tokens(F.coalesce(F.col(text_col), F.lit("")))
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    ev = docs.select(
        id_col, *(extra_cols or []), F.explode(pairs).alias("__p")
    )
    return ev.select(
        id_col,
        *(extra_cols or []),
        _bucket(F.col("__p.w1"), ctx_buckets).alias("b1"),
        _bucket(
            F.concat(F.col("__p.w1"), F.lit(" "), F.col("__p.w2")),
            pair_buckets,
        ).alias("b12"),
    )


def ngram_lm_fit(
    fit_events: DataFrame,
    *,
    pair_buckets: int = PAIR_BUCKETS,
    key_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Fit the model from a (b1, b12) event stream: returns
    ``(pair_model, ctx_model)``.

    ``pair_model``: ([keys,] b1, b12, c12, lp_e4) — one row per
    OBSERVED (context, pair) bucket combination, bounded by
    ctx_buckets * pair_buckets (per key) by construction.
    ``ctx_model``: ([keys,] b1, c1, floor_e4) — one row per observed
    context with its event total and its smoothed unseen-pair floor.

    ``key_cols`` (e.g. ``("lang",)``) fits one independent model per
    key — CCNet's per-language construction; the add-one smoothing
    and both floors apply within each key's own event totals.
    """
    a = float(ALPHA)
    keys = list(key_cols)
    # ONE pass over the event stream: aggregate to the bounded
    # (b1, b12) pair table and pool-persist it, then derive the
    # context totals FROM it (c1 = sum of c12 over the context — the
    # identical integer, every observed b1 has at least one observed
    # pair bucket). Before r11 ctx and pairs each aggregated
    # fit_events, and the two model broadcasts each re-ran the
    # tokenize+explode subtree — three passes over the fit corpus per
    # scoring query; now the corpus is read once and everything else
    # aggregates the <= ctx_buckets*pair_buckets-row cache (guide
    # §2.3 "aggregate before you shuffle", §5 persist-on-reuse).
    pairs = bounded_persist(
        fit_events.groupBy(*keys, "b1", "b12").agg(
            F.count("*").alias("c12")
        )
    )
    ctx = pairs.groupBy(*keys, "b1").agg(F.sum("c12").alias("c1"))
    pair_model = (
        pairs.join(ctx, [*keys, "b1"])
        .select(
            *keys,
            "b1",
            "b12",
            F.col("c12").cast("bigint").alias("c12"),
            quantized(
                F.log(
                    (F.col("c12") + F.lit(a))
                    / (F.col("c1") + F.lit(a * pair_buckets))
                )
            ).alias("lp_e4"),
        )
    )
    ctx_model = ctx.select(
        *keys,
        "b1",
        F.col("c1").cast("bigint").alias("c1"),
        quantized(
            F.log(F.lit(a) / (F.col("c1") + F.lit(a * pair_buckets)))
        ).alias("floor_e4"),
    )
    return pair_model, ctx_model


def _bucket_guard(col: str, n: int, param: str):
    """Codegen'd per-row consistency check on a BOUNDED model table: a
    model bucket outside ``[0, n)`` means the model was fitted with a
    different ``{param}`` than the scorer was given — without the
    guard every event silently misses the join and floods onto the
    smoothed floors (wrong scores, no error; the dsir_scores
    bucket_guard precedent, ADVICE r10). Catches a LARGER fit
    configuration structurally; a smaller one is indistinguishable
    from sparse data, so keep fit and score parameters in one place."""
    return (
        F.when(
            (F.col(col) < 0) | (F.col(col) >= n),
            F.raise_error(
                F.concat(
                    F.lit(f"ngram_lm_scores: model {col} "),
                    F.col(col).cast("string"),
                    F.lit(
                        f" outside [0, {n}) — the model was fitted "
                        f"with a different {param}"
                    ),
                )
            ),
        )
        .otherwise(F.col(col))
        .alias(col)
    )


def ngram_lm_scores(
    docs: DataFrame,
    pair_model: DataFrame,
    ctx_model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_buckets: int = CTX_BUCKETS,
    pair_buckets: int = PAIR_BUCKETS,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every document under the fitted model: ``(id_col,
    n_bigrams, logprob_sum_e4)`` — the exact integer sum of per-event
    e4 log-probs (more negative = less target-like; CCNet keeps the
    low-perplexity head). Every input doc keeps its row; a doc with
    no bigrams sums to 0 over 0 events.

    ``key_cols`` (e.g. ``("lang",)``) must match the fit: each event
    joins the model of its OWN key — CCNet's per-language scoring. A
    key with no fitted model scores through the global floor.

    Both model sides ride explicit broadcasts — bounded by
    construction at ctx_buckets*pair_buckets and ctx_buckets rows per
    key (the DSIR completed-model precedent), and both carry a
    codegen'd bucket-range guard so a model fitted with different
    bucket counts raises instead of silently flooring every event."""
    keys = list(key_cols)
    ev = bigram_events(
        docs,
        text_col=text_col,
        id_col=id_col,
        ctx_buckets=ctx_buckets,
        pair_buckets=pair_buckets,
        extra_cols=keys,
    )
    floor = F.lit(global_floor_e4(pair_buckets)).cast("bigint")
    scored = (
        ev.join(
            F.broadcast(
                pair_model.select(
                    *keys,
                    _bucket_guard("b1", ctx_buckets, "ctx_buckets"),
                    _bucket_guard("b12", pair_buckets, "pair_buckets"),
                    "lp_e4",
                )
            ),
            [*keys, "b1", "b12"],
            "left",
        )
        .join(
            F.broadcast(
                ctx_model.select(
                    *keys,
                    _bucket_guard("b1", ctx_buckets, "ctx_buckets"),
                    "floor_e4",
                )
            ),
            [*keys, "b1"],
            "left",
        )
        .select(
            id_col,
            F.coalesce("lp_e4", "floor_e4", floor).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("__lp").cast("bigint").alias("logprob_sum_e4"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("logprob_sum_e4", F.lit(0))
            .cast("bigint")
            .alias("logprob_sum_e4"),
        )
    )
