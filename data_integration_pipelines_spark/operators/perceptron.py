"""Distributed batch-perceptron trainer for the quality classifier —
the TRAINING face of the fasttext-style quality-filter stage
(quality_classifier_score scores with fixed weights; this learns them
from a reference-vs-crawl labeling, the GPT-3/LLaMA curation recipe:
positive = reference-quality sources, negative = everything else).

Why a perceptron and not logistic-regression GD: the logistic gradient
needs a sigmoid, and libm ``exp`` is not cross-engine reproducible
(the quality_classifier_score precedent bans it from oracle-checked
outputs). The perceptron trajectory is INTEGER-EXACT end to end:
features are the engine-exact quality ratios quantized to e4 BIGINTs
(functions/quantize.py), the misclassification test ``y * (w·f) <= 0``
and the batch update ``w += SUM(y*f over misclassified)`` are
order-independent BIGINT sums — so the whole training history is
bit-identical on Spark and the DuckDB oracle and invariant to
partitioning (no fp summation-order drift), and the unrolled-CTE SQL
oracle certifies every iteration, not just the final weights.

Spark mechanics (the k-means driver-loop convention,
operators/clustering.py): per iteration ONE codegen scan — a filter on
the current margin (weights substituted as literals) feeding a 5-value
aggregate — and the driver holds exactly the weight vector (4 ints).
Per-iteration cost is a map + single-row reduce; k iterations = k
passes over the feature frame (persist it). At 100 TB headroom note:
raw lr=1 updates grow |w| ~ n·1.5e5 per pass, so margins stay inside
int64 up to ~1e10 docs per shard-epoch; beyond that, normalize the
update by n_miss in exact integer arithmetic or sum in DECIMAL(38,0)
— the decision rule is scale-invariant either way.

Reference parity: the reference has no trainer (its curation is
rule-batteries, e.g. src/trace/validation/validation.py:208-376); this
extends the same per-row check pattern with the learned-filter stage a
web-scale corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantize import e4
from ..functions.text import quality_features, ws_tokens

#: feature columns in weight order: bias, stopword ratio, mean token
#: length, type-token ratio — all e4-scaled BIGINTs
FEATURE_COLS = ("f_bias", "f_swr", "f_atl", "f_ttr")

#: e4 of the constant 1.0 bias input
BIAS_E4 = 10_000

#: the fixture's reference-quality sources (the per-language LM family
#: already treats src0-src3 as the Wikipedia-like targets)
POSITIVE_SOURCES = ("src0", "src1", "src2", "src3")


def perceptron_features(
    docs: DataFrame, positive_sources: tuple[str, ...] = POSITIVE_SOURCES
) -> DataFrame:
    """(doc_id, y, f_bias, f_swr, f_atl, f_ttr): label +1 for
    reference-quality sources, -1 otherwise; features are the
    quality-scorer ratios as e4 BIGINTs (exact on both engines)."""
    toks = ws_tokens(F.col("text"))
    feats = quality_features(toks)
    return docs.select(
        "doc_id",
        F.when(F.col("source").isin(*positive_sources), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        F.lit(BIAS_E4).cast("long").alias("f_bias"),
        e4(feats["swr"]).alias("f_swr"),
        e4(feats["atl"]).alias("f_atl"),
        e4(feats["ttr"]).alias("f_ttr"),
    )


def _margin(weights: list[int]) -> F.Column:
    m = F.lit(int(weights[0])) * F.col(FEATURE_COLS[0])
    for w, c in zip(weights[1:], FEATURE_COLS[1:]):
        m = m + F.lit(int(w)) * F.col(c)
    return m


def perceptron_train(feats: DataFrame, n_iters: int = 3) -> list[dict]:
    """Batch perceptron from w=0, lr=1: per iteration, count the
    misclassified rows (``y * margin <= 0`` — ties count as missed, so
    iteration 1 from w=0 is the classic ``w¹ = Σ y·f`` full-batch
    update) and add the exact integer gradient. Returns the full
    history: one dict per iteration with the miss count BEFORE the
    update and the weights AFTER it. Driver state is the weight vector
    only."""
    from .cache import bounded_persist

    feats = bounded_persist(feats)
    w = [0] * len(FEATURE_COLS)
    history: list[dict] = []
    try:
        for it in range(1, n_iters + 1):
            miss = feats.filter(F.col("y") * _margin(w) <= 0)
            row = miss.agg(
                F.count("*").alias("n_miss"),
                *[
                    F.sum(F.col("y") * F.col(c)).alias(f"g{j}")
                    for j, c in enumerate(FEATURE_COLS)
                ],
            ).collect()[0]
            w = [
                wj + (row[f"g{j}"] or 0) for j, wj in enumerate(w)
            ]  # empty sum -> None -> 0
            history.append(
                {
                    "iter": it,
                    "n_miss": row["n_miss"],
                    "w_bias": w[0],
                    "w_swr": w[1],
                    "w_atl": w[2],
                    "w_ttr": w[3],
                }
            )
    finally:
        feats.unpersist()
    return history


def perceptron_history_df(spark: SparkSession, history: list[dict]) -> DataFrame:
    """The training history as a DataFrame (all BIGINT — hash-proof)."""
    return spark.createDataFrame(
        [
            (
                h["iter"],
                h["n_miss"],
                h["w_bias"],
                h["w_swr"],
                h["w_atl"],
                h["w_ttr"],
            )
            for h in history
        ],
        "iter long, n_miss long, w_bias long, w_swr long, w_atl long, w_ttr long",
    )


def perceptron_scores(feats: DataFrame, weights: list[int]) -> DataFrame:
    """Score a feature frame with trained weights: exact integer margin,
    predicted label (ties predict -1, matching the training rule's
    'ties are missed' convention for y=+1), and correctness flag."""
    margin = _margin(weights)
    return feats.select(
        "doc_id",
        "y",
        margin.alias("margin"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias(
            "predicted"
        ),
        (F.col("y") * margin > 0).alias("correct"),
    )
