"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the selection method of Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" (DSIR), the standard recipe
for skewing a raw crawl toward a target domain at pretraining scale:

1. hash feature occurrences into ``n_buckets`` buckets — unigram
   tokens by default, unigrams + adjacent bigrams with ``ngrams=2``
   (the hashed unigram+bigram space the paper actually uses),
2. fit add-one-smoothed bucket distributions for the TARGET
   subset (p̂) and the full SOURCE corpus (q̂),
3. score every document with the importance log-ratio
   ``sum_tokens ln(p̂[b]/q̂[b])``,
4. resample top-k under deterministic Gumbel noise (importance
   resampling, not plain top-k — the noise keeps the selected set a
   sample from the tilted distribution instead of a mode-collapsed
   head).

Everything is cross-engine exact: buckets come from the md5-hex hash
domain (the minhash/simhash precedent in ``functions/text.py``), each
bucket's log-ratio is e4-quantized to a BIGINT ONCE (``functions/
quantize.py`` — ln is the only transcendental, the BM25 precedent),
and per-document scores are then INTEGER sums of those bigints —
order-independent, overflow-safe, and bit-identical on Spark, DuckDB
and pandas. Gumbel noise derives from md5(doc_id), so the "random"
resample is reproducible in the oracle.

Scale design (100 TB):
- Token bucketing is a per-row explode + hash — linear, no shuffle,
  whole-stage-codegen'd.
- The fitted model is ``n_buckets`` rows BY CONSTRUCTION (64 here,
  ~10k in production DSIR) — the scoring join is an explicit
  ``F.broadcast`` (the decontaminate fixed-bitmap precedent: bounded
  model state is the one place a broadcast hint is honest).
- Per-doc scoring is one groupBy(doc) integer sum; resampling is a
  TakeOrdered top-k, never a full sort.

Reference anchor: extends the reference's scoring/row-validation
pattern (per-row metric columns — cf. the check batteries, SURVEY
§2.9) to corpus-level distribution matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.quantize import quantized
from ..functions.text import ws_tokens

__all__ = [
    "token_bucket_col",
    "dsir_occurrences",
    "dsir_bucket_model",
    "dsir_scores",
    "dsir_resample",
]

#: add-one smoothing, fixed across engines
ALPHA = 1


def token_bucket_col(tok: Column, n_buckets: int) -> Column:
    """Feature bucket of one token: integer value of the first 4 md5
    hex chars (0..65535, md5-hex domain = engine-portable) mod
    ``n_buckets``."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int")
        % F.lit(n_buckets)
    )


def dsir_occurrences(
    docs: DataFrame,
    target_pred: Column | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    ngrams: int = 1,
) -> DataFrame:
    """One row per FEATURE occurrence: ``(id_col, [__is_tgt,] bucket)``.

    ``ngrams=1`` hashes unigram tokens; ``ngrams=2`` hashes unigrams
    AND space-joined adjacent bigrams — the feature space Xie et al.
    2023 actually use (hashed unigram+bigram counts). The bigram array
    is built token-array-side (``zip_with`` of the two shifted
    ``slice`` views — per-row, shuffle-free) before the single explode,
    so the 2-gram path costs one extra array transform, not a join: a
    doc with n tokens emits 2n-1 feature occurrences.

    The shared first stage of the DSIR pipeline — tokenize + md5-bucket
    is the dominant corpus-scan cost, so callers running fit AND score
    in one job should build this ONCE (``bounded_persist`` it) and pass
    it to both :func:`dsir_bucket_model` and :func:`dsir_scores` via
    their ``occ`` parameter. NULL text coalesces to '' (one
    empty-token occurrence, the repo-wide whitespace-split convention)
    so no document vanishes from scoring — including under ``ngrams=2``
    (a 1-token doc has no bigrams but keeps its unigram)."""
    if ngrams not in (1, 2):
        raise ValueError(f"ngrams={ngrams}: only 1 (unigram) or 2 "
                         "(unigram+bigram) feature spaces are defined")
    cols = [F.col(id_col)]
    if target_pred is not None:
        cols.append(target_pred.alias("__is_tgt"))
    toks = docs.select(
        *cols, ws_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t")
    )
    feats = F.col("__t")
    if ngrams == 2:
        feats = F.concat(
            feats,
            F.zip_with(
                F.slice("__t", 1, F.size("__t") - 1),
                F.slice("__t", 2, F.size("__t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
    passthrough = [c for c in toks.columns if c != "__t"]
    return toks.select(
        *passthrough, F.explode(feats).alias("__tok")
    ).withColumn(
        "bucket", token_bucket_col(F.col("__tok"), n_buckets)
    ).drop("__tok")


def dsir_bucket_model(
    docs: DataFrame,
    target_pred: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    occ: DataFrame | None = None,
    ngrams: int = 1,
) -> DataFrame:
    """Fit the hashed-ngram importance model: one row per OCCUPIED
    bucket with target/source occurrence counts and the e4-quantized
    smoothed log-ratio ``ln(p̂[b]/q̂[b])``.

    The ratio is expanded to one ln over an integer-valued rational —
    ``ln((tgt+α)·(SRC_TOT+αB) / ((src+α)·(TGT_TOT+αB)))`` — built with
    the identical association on both engines, then e4-quantized, so
    scores downstream are exact integer sums.

    Empty buckets are omitted: a bucket no token hashes to can never
    contribute to a document score, and the source total over occupied
    buckets equals the corpus total, so p̂/q̂ are unchanged.

    Pass a prebuilt (ideally persisted) ``occ`` from
    :func:`dsir_occurrences` WITH ``target_pred`` to share the corpus
    scan with downstream scoring; ``target_pred`` and ``ngrams`` are
    then unused here (the occurrence table already fixed the feature
    space).
    """
    if occ is None:
        occ = dsir_occurrences(
            docs,
            target_pred,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            ngrams=ngrams,
        )
    counts = occ.groupBy("bucket").agg(
        F.count("*").alias("n_source"),
        F.sum(F.when(F.col("__is_tgt"), 1).otherwise(0)).alias("n_target"),
    )
    # corpus totals as an unpartitioned window over the BUCKET table —
    # n_buckets rows by construction, so the single-partition window is
    # a constant-size reduction at any corpus scale (and avoids a
    # 1-row broadcast-nested-loop join, which the plan gate forbids)
    everything = Window.partitionBy()
    counts = counts.withColumn("__st", F.sum("n_source").over(everything)).withColumn(
        "__tt", F.sum("n_target").over(everything)
    )
    a, b = float(ALPHA), n_buckets
    return (
        counts
        .select(
            "bucket",
            F.col("n_target").cast("bigint").alias("n_target"),
            F.col("n_source").cast("bigint").alias("n_source"),
            quantized(
                F.log(
                    ((F.col("n_target") + F.lit(a)) * (F.col("__st") + F.lit(a * b)))
                    / ((F.col("n_source") + F.lit(a)) * (F.col("__tt") + F.lit(a * b)))
                )
            ).alias("logratio_e4"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    occ: DataFrame | None = None,
    ngrams: int = 1,
) -> DataFrame:
    """Per-document importance score: the exact integer sum of the
    model's e4 bucket log-ratios over the doc's token occurrences.
    Returns ``(id_col, n_tokens, score_e4)`` — EVERY input doc, one
    row, enforced by a left join from the id set (a doc scored by a
    model fitted on a DIFFERENT corpus may hit buckets the model never
    saw; same-corpus scoring can't, but the contract must not depend
    on which corpus the caller passes).

    Unseen buckets contribute the model's own smoothed default — the
    log-ratio at (n_target=0, n_source=0), i.e.
    ``ln((SRC_TOT+αB)/(TGT_TOT+αB))`` over the FIT corpus totals. The
    model is COMPLETED to all ``n_buckets`` ids first (spark.range +
    left join + default fill, all windows over the bounded bucket
    table), so the corpus-side join is a plain inner broadcast join
    that cannot miss — no per-occurrence null handling, no
    nested-loop scalar attachment.

    A model fitted with a DIFFERENT ``n_buckets`` raises instead of
    silently truncating (ADVICE r9): the completion join is FULL outer,
    so a model bucket outside ``[0, n_buckets)`` survives into the
    completed table and trips a codegen'd per-row guard — with a left
    join it would vanish, silently skewing the ``__st``/``__tt``
    totals and the unseen-bucket default. (The full-outer on two
    n_buckets-row tables is a constant-size sort-merge — noise.)

    Pass a prebuilt ``occ`` from :func:`dsir_occurrences` to reuse the
    tokenize+hash scan paid by the model fit; ``ngrams`` is unused
    when ``occ`` is given, and must otherwise match the feature space
    the model was fitted on."""
    if occ is None:
        occ = dsir_occurrences(
            docs,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            ngrams=ngrams,
        )
    a, b = float(ALPHA), n_buckets
    everything = Window.partitionBy()
    bucket_guard = F.when(
        (F.col("bucket") < 0) | (F.col("bucket") >= n_buckets),
        F.raise_error(
            F.concat(
                F.lit("dsir_scores: model bucket "),
                F.col("bucket").cast("string"),
                F.lit(
                    f" outside [0, {n_buckets}) — the model was fitted "
                    "with a different n_buckets"
                ),
            )
        ),
    ).otherwise(F.col("bucket"))
    full = (
        docs.sparkSession.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(
            model.select(
                F.col("bucket").cast("int").alias("bucket"),
                "n_source",
                "n_target",
                "logratio_e4",
            ),
            "bucket",
            "full",
        )
        .withColumn("bucket", bucket_guard)
        # fit-corpus totals over the COMPLETED (still n_buckets-row)
        # table — missing buckets contribute 0, so one window after
        # the join replaces a pre-join window plus a re-spread
        .withColumn(
            "__st",
            F.sum(F.coalesce("n_source", F.lit(0))).over(everything),
        )
        .withColumn(
            "__tt",
            F.sum(F.coalesce("n_target", F.lit(0))).over(everything),
        )
        .select(
            "bucket",
            F.coalesce(
                "logratio_e4",
                quantized(
                    F.log(
                        (F.col("__st") + F.lit(a * b))
                        / (F.col("__tt") + F.lit(a * b))
                    )
                ),
            ).alias("logratio_e4"),
        )
    )
    scored = (
        occ.join(F.broadcast(full), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("logratio_e4").cast("bigint").alias("score_e4"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("score_e4", F.lit(0)).cast("bigint").alias("score_e4"),
        )
    )


def _gumbel_e4(id_col: Column) -> Column:
    """Deterministic e4-quantized Gumbel(0,1) draw from md5(doc_id):
    u = (first-8-hex-chars + 1) / (2^32 + 1) ∈ (0,1), g = -ln(-ln u).
    Same expression tree as the SQL mirror below."""
    u = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    return quantized(-F.log(-F.log(u)))


def dsir_resample(
    scored: DataFrame, *, id_col: str = "doc_id", k: int = 100
) -> DataFrame:
    """Gumbel-top-k importance resample: key = score_e4 + gumbel_e4
    (both integer e4 nats — the noise is on the same scale as the
    score, the Gumbel-max trick's requirement), top ``k`` by key with
    id ascending as the deterministic tiebreak. orderBy+limit plans as
    TakeOrdered — per-partition heaps, never a full sort."""
    keyed = scored.withColumn(
        "sample_key_e4",
        (F.col("score_e4") + _gumbel_e4(F.col(id_col))).cast("bigint"),
    )
    return keyed.orderBy(F.desc("sample_key_e4"), id_col).limit(k)
