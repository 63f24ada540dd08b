"""DSIR importance resampling (operators/dsir.py): model-fit laws,
score semantics, and resample determinism beyond the oracle hash."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_integration_pipelines_spark.operators.dsir import (
    dsir_bucket_model,
    dsir_resample,
    dsir_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "alpha beta alpha beta alpha", "en"),
        (2, "alpha beta gamma delta", "en"),
        (3, "gamma delta gamma delta epsilon", "de"),
        (4, "epsilon zeta eta theta", "de"),
    ]
    docs = _docs(spark, rows)
    model = dsir_bucket_model(docs, F.col("lang") == "en", n_buckets=8)
    return docs, model


def test_model_totals_and_bounds(tiny):
    """Source counts cover every token occurrence; target counts are a
    subset; the model never exceeds n_buckets rows."""
    docs, model = tiny
    rows = model.collect()
    assert len(rows) <= 8
    assert sum(r.n_source for r in rows) == 18  # total occurrences
    assert sum(r.n_target for r in rows) == 9  # en occurrences
    assert all(0 <= r.n_target <= r.n_source for r in rows)


def test_logratio_matches_reference_formula(tiny):
    """Each bucket's e4 log-ratio equals the add-one-smoothed formula
    computed independently in Python (same IEEE ops)."""
    docs, model = tiny
    st, tt, b = 18.0, 9.0, 8
    for r in model.collect():
        lr = math.log(
            ((r.n_target + 1.0) * (st + 1.0 * b))  # st + alpha*B
            / ((r.n_source + 1.0) * (tt + 1.0 * b))
        )
        expect = int(math.copysign(math.floor(abs(lr) * 10000 + 0.5), lr))
        assert r.logratio_e4 == expect, r


def test_scores_are_exact_bucket_sums(tiny):
    """A document's score is exactly the sum of its occurrences'
    bucket log-ratios — verified doc-by-doc against the model."""
    docs, model = tiny
    lut = {r.bucket: r.logratio_e4 for r in model.collect()}
    from data_integration_pipelines_spark.operators.dsir import (
        token_bucket_col,
    )
    from data_integration_pipelines_spark.functions.text import ws_tokens

    occ = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    ).select("doc_id", token_bucket_col(F.col("tok"), 8).alias("bucket"))
    expected: dict[int, int] = {}
    for r in occ.collect():
        expected[r.doc_id] = expected.get(r.doc_id, 0) + lut[r.bucket]
    got = {
        r.doc_id: r.score_e4
        for r in dsir_scores(docs, model, n_buckets=8).collect()
    }
    assert got == expected


def test_target_docs_score_higher_on_average(tiny):
    """The tilt points the right way: mean score of target-domain docs
    exceeds mean score of the rest (the whole point of DSIR)."""
    docs, model = tiny
    scores = {
        r.doc_id: r.score_e4
        for r in dsir_scores(docs, model, n_buckets=8).collect()
    }
    en = (scores[1] + scores[2]) / 2
    de = (scores[3] + scores[4]) / 2
    assert en > de, scores


def test_resample_deterministic_and_keyed(tiny):
    """Same inputs -> identical sample, twice in one session; keys are
    score + Gumbel and the output respects the key order."""
    docs, model = tiny
    scored = dsir_scores(docs, model, n_buckets=8)
    a = dsir_resample(scored, k=3).collect()
    b = dsir_resample(scored, k=3).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    keys = [r.sample_key_e4 for r in a]
    assert keys == sorted(keys, reverse=True)
    assert len(a) == 3
    # noise actually perturbs: at least one key differs from its score
    assert any(r.sample_key_e4 != r.score_e4 for r in a)


def test_fixture_model_is_64_rows_and_scores_cover_corpus(spark, sf_medium):
    from data_integration_pipelines_spark.plans import REGISTRY

    model = REGISTRY["dsir_bucket_model"].fn(spark, sf_medium)
    assert model.count() <= 64
    scores = REGISTRY["dsir_importance_scores"].fn(spark, sf_medium)
    assert scores.count() == 500  # every doc scored
    sample = REGISTRY["dsir_resample_topk"].fn(spark, sf_medium)
    assert sample.count() == 100


def test_cross_corpus_scoring_every_doc_with_default(spark):
    """Scoring a corpus the model never saw: no doc drops, unseen
    buckets contribute the model's smoothed default ln((ST+B)/(TT+B))
    over the FIT corpus totals."""
    fit = _docs(spark, [(1, "alpha beta alpha", "en"), (2, "gamma delta", "de")])
    model = dsir_bucket_model(fit, F.col("lang") == "en", n_buckets=8)
    # tokens chosen so at least some hash to buckets absent from the
    # tiny fit corpus (8 buckets, 4 distinct fit tokens -> <=4 occupied)
    new = _docs(
        spark,
        [
            (10, "zzz yyy xxx www vvv uuu ttt sss", "en"),
            (11, "alpha beta", "en"),
        ],
    )
    got = {r.doc_id: r for r in dsir_scores(new, model, n_buckets=8).collect()}
    assert set(got) == {10, 11}
    assert got[10].n_tokens == 8  # nothing truncated
    st, tt = 5.0, 3.0  # fit totals: 5 occurrences, 3 en
    default = math.log((st + 8.0) / (tt + 8.0))
    default_e4 = int(math.copysign(math.floor(abs(default) * 10000 + 0.5), default))
    lut = {r.bucket: r.logratio_e4 for r in model.collect()}
    from data_integration_pipelines_spark.functions.text import ws_tokens
    from data_integration_pipelines_spark.operators.dsir import token_bucket_col

    occ = new.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    ).select("doc_id", token_bucket_col(F.col("tok"), 8).alias("bucket"))
    expect: dict[int, int] = {}
    for r in occ.collect():
        expect[r.doc_id] = expect.get(r.doc_id, 0) + lut.get(r.bucket, default_e4)
    assert {d: r.score_e4 for d, r in got.items()} == expect


def test_bigram_occurrences_are_unigrams_plus_adjacent_pairs(spark):
    """ngrams=2 emits exactly 2n-1 features per n-token doc: every
    unigram plus every space-joined adjacent pair, bucketed through
    the same md5 domain — verified feature-by-feature against a
    Python re-derivation."""
    from data_integration_pipelines_spark.operators.dsir import (
        dsir_occurrences,
        token_bucket_col,
    )

    rows = [(1, "alpha beta gamma", "en"), (2, "solo", "en")]
    docs = _docs(spark, rows)
    occ = dsir_occurrences(docs, n_buckets=8, ngrams=2).collect()
    counts: dict[int, int] = {}
    for r in occ:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    assert counts == {1: 5, 2: 1}  # 2*3-1 and 2*1-1
    # bucket multiset matches the expected feature strings
    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma", "solo"]
    want = sorted(
        r.bucket
        for r in spark.createDataFrame([(f,) for f in feats], "f string")
        .select(token_bucket_col(F.col("f"), 8).alias("bucket"))
        .collect()
    )
    assert sorted(r.bucket for r in occ) == want


def test_bigram_scores_match_manual_feature_sum(spark):
    """Bigram scoring keeps the exact-integer-sum contract: each doc's
    score equals the sum of its 2n-1 features' model log-ratios."""
    from data_integration_pipelines_spark.functions.text import ws_tokens
    from data_integration_pipelines_spark.operators.dsir import (
        dsir_bucket_model,
        dsir_occurrences,
        dsir_scores,
        token_bucket_col,
    )

    rows = [
        (1, "alpha beta alpha beta alpha", "en"),
        (2, "alpha beta gamma delta", "en"),
        (3, "gamma delta gamma delta epsilon", "de"),
    ]
    docs = _docs(spark, rows)
    model = dsir_bucket_model(
        docs, F.col("lang") == "en", n_buckets=8, ngrams=2
    )
    lut = {r.bucket: r.logratio_e4 for r in model.collect()}
    expected: dict[int, int] = {}
    for doc_id, text, _lang in rows:
        toks = text.split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        fdf = spark.createDataFrame([(f,) for f in feats], "f string")
        for r in fdf.select(token_bucket_col(F.col("f"), 8).alias("b")).collect():
            expected[doc_id] = expected.get(doc_id, 0) + lut[r.b]
    got = {
        r.doc_id: r.score_e4
        for r in dsir_scores(docs, model, n_buckets=8, ngrams=2).collect()
    }
    assert got == expected
    # and n_tokens counts features, 2n-1
    nt = {
        r.doc_id: r.n_tokens
        for r in dsir_scores(docs, model, n_buckets=8, ngrams=2).collect()
    }
    assert nt == {1: 9, 2: 7, 3: 9}


def test_model_n_buckets_mismatch_raises(spark):
    """A model carrying a bucket id outside [0, n_buckets) means fit
    and score disagree on the feature space — dsir_scores raises
    loudly (ADVICE r9) instead of silently dropping the bucket and
    skewing the smoothed default."""
    docs = _docs(spark, [(1, "alpha beta", "en")])
    bad_model = spark.createDataFrame(
        [(12, 5, 2, 1234)],
        "bucket int, n_target bigint, n_source bigint, logratio_e4 bigint",
    )
    with pytest.raises(Exception, match="different n_buckets"):
        dsir_scores(docs, bad_model, n_buckets=8).collect()


def test_null_text_doc_still_scored(spark):
    """NULL text coalesces to '' (one empty-token occurrence) — the
    doc keeps its row instead of vanishing from the report."""
    rows = [(1, "alpha beta", "en"), (2, None, "en")]
    docs = _docs(spark, rows)
    model = dsir_bucket_model(docs, F.col("lang") == "en", n_buckets=8)
    got = {r.doc_id: r for r in dsir_scores(docs, model, n_buckets=8).collect()}
    assert set(got) == {1, 2}
    assert got[2].n_tokens == 1  # the coalesced empty token


# --- corpus frequency diagnostics (registered beside DSIR: both are
# corpus-distribution tooling over the documents table) --------------


def test_zipf_fit_recovers_minus_one_on_zipfian_corpus(spark):
    """A constructed corpus with freq(token_i) = floor(120/i) is
    Zipfian by design — the fitted log-log slope must sit near -1
    (quantization + integer floors allow small deviation)."""
    words = []
    for i in range(1, 13):
        words += [f"w{i:02d}"] * (120 // i)
    text = " ".join(words)
    docs = spark.createDataFrame(
        [(1, text, "en")], "doc_id bigint, text string, lang string"
    )
    freq = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    from pyspark.sql import Window
    from data_integration_pipelines_spark.functions.quantize import quantized

    ranked = freq.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok")))
    )
    terms = ranked.select(
        quantized(F.log(F.col("rank").cast("double"))).alias("x_e4"),
        quantized(F.log(F.col("freq").cast("double"))).alias("y_e4"),
    )
    r = terms.agg(
        F.count("*").alias("n"),
        F.sum("x_e4").alias("sx"),
        F.sum("y_e4").alias("sy"),
        F.sum(F.col("x_e4") * F.col("y_e4")).alias("sxy"),
        F.sum(F.col("x_e4") * F.col("x_e4")).alias("sxx"),
    ).collect()[0]
    slope = (r.n * r.sxy - r.sx * r.sy) / (r.n * r.sxx - r.sx * r.sx)
    assert -1.1 < slope < -0.9, slope


def test_zipf_degenerate_one_type_vocabulary_nulls_identically(
    spark, tmp_path
):
    """ADVICE r9: a one-type vocabulary zeroes the OLS variance
    denominator. The NULLIF guard pins slope and intercept to NULL on
    BOTH engines (unguarded, Spark yields NULL but DuckDB yields IEEE
    nan — a silent oracle divergence on a pathological corpus)."""
    import duckdb
    import pandas as pd

    from data_integration_pipelines_spark.plans import REGISTRY

    docs = spark.createDataFrame(
        [(0, "a a a a", "en", "web", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    q = REGISTRY["zipf_fit"]
    row = q.fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_types, row.n_tokens) == (1, 4)
    assert row.slope_e4 is None and row.intercept_e4 is None
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}/*.parquet')"
        )
        odf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    orow = odf.iloc[0]
    assert orow["n_types"] == 1
    assert pd.isna(orow["slope_e4"]) and pd.isna(orow["intercept_e4"])


def test_freq_spectrum_conserves_vocab_and_tokens(spark, sf_medium):
    """Spectrum invariants against the registered queries: sum of
    n_types = vocabulary size, sum of freq*n_types = corpus tokens,
    and both agree with zipf_fit's one-row totals."""
    from data_integration_pipelines_spark.plans import REGISTRY

    spec = REGISTRY["token_freq_spectrum"].fn(spark, sf_medium).collect()
    fit = REGISTRY["zipf_fit"].fn(spark, sf_medium).collect()[0]
    assert sum(r.n_types for r in spec) == fit.n_types
    assert sum(r.freq * r.n_types for r in spec) == fit.n_tokens
