"""Registry-order pins.

The driver's CORRECTNESS sweep is time-budgeted and visits queries in
registry order (it stopped at the first 50 entries in rounds 1 and 2).
These pins keep the verification-risk ordering honest: the kernels that
had no driver row through round 2 must sit inside the budget window,
and the explicit order list must stay in sync with the registry.
"""

from __future__ import annotations

from data_integration_pipelines_spark.plans import _RISK_ORDER, REGISTRY

# Every query needing a fresh GREEN driver CORRECTNESS row after
# round 10 (the r10 set — line-mode boilerplate, DSIR bigrams, the
# ngram-LM/CCNet tier, leakage_safe_split — all earned green rows in
# CORRECTNESS_r10; the r1-r10 union covers all 198 pre-r11 queries
# with zero never-passed entries, VERDICT r10): the queries NEW in
# r11, which have never been driver-compared. The r11 plan changes
# with UNCHANGED fixture output (the ngram_lm_scores model
# bucket-range guard, ADVICE r10) sit directly behind them in the
# head, followed by the r11 rotation slice (the FULL 51-query r2-r4
# stale tail — VERDICT r10 task 1).
_NEVER_DRIVER_VERIFIED = {
    # new in r11
    "gopher_full_filter",
    "gopher_document_rules",
    "gopher_repetition_filter",
    "gopher_repetition_signals",
    "quality_perceptron_train",
    "quality_perceptron_scores",
    "shard_shuffle_manifest",
    "corpus_distinct_ngrams",
    "corpus_distinct_ngrams_approx",
    "ngram_lm_perplexity_perlang",
    "ccnet_ppl_buckets_perlang",
    "ccnet_funnel_perlang",
    "ngram_lm_perlang_model",
    "ccnet_ppl_buckets_approx",
    "leakage_split_manifest",
}


def test_risk_order_names_all_exist():
    missing = [n for n in _RISK_ORDER if n not in REGISTRY]
    assert not missing, f"_RISK_ORDER names not in REGISTRY (typo?): {missing}"


def test_risk_order_covers_registry():
    stragglers = [n for n in REGISTRY if n not in set(_RISK_ORDER)]
    assert not stragglers, (
        f"queries registered but not triaged into _RISK_ORDER: {stragglers}; "
        "add each to a deliberate slot (high-risk kernels go early)"
    )


def test_never_verified_queries_inside_sweep_budget():
    order = list(REGISTRY)
    # +2: changed-plan-same-output entries may interleave with the
    # never-verified ones at the very head (r8: the threshold-rewritten
    # quality_stratified_sample sits between its new ranked twin and
    # the new capped kernel)
    window = set(order[: len(_NEVER_DRIVER_VERIFIED) + 2])
    outside = sorted(_NEVER_DRIVER_VERIFIED - window)
    assert not outside, (
        "never-driver-verified queries outside the first "
        f"{len(_NEVER_DRIVER_VERIFIED) + 2} registry slots: {outside}"
    )


def test_registry_order_matches_risk_order_prefix():
    assert list(REGISTRY)[: len(_RISK_ORDER)] == [n for n in _RISK_ORDER if n in REGISTRY]
