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
# round 6: queries whose OUTPUT changed in r7 (the probed-kernel
# recomposition made dedup_consensus/embedding_dup_clusters emit the
# Hamming<=1 pair set; the BPE pair is hash-compared for the first
# time via golden-table oracles) plus queries new in r7. The r7 plan
# rewrites with IDENTICAL output (salted stratified rank, two-level
# offsets, auto quantile cuts) sit directly behind them in the head.
_NEVER_DRIVER_VERIFIED = {
    # output changed in r7 (probed-kernel recomposition)
    "dedup_consensus",
    "embedding_dup_clusters",
    # hash-compared for the first time in r7 (golden-table oracles)
    "bpe_train_merges",
    "bpe_encode_tokens",
    # new in r7
    "training_chunks_single_source",
    "quantile_bins_approx",
    "semdedup_survivors_auto_k",
    "kmeans_assign_pivoted",
    "semdedup_survivors_pivoted",
    "contamination_fraction_wide_eval",
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
    # +2: the flagship (pricing_summary, always first) and
    # kmeans_clusters (kept beside the semdedup family it shares its
    # fit with) sit in the head without needing re-verification
    window = set(order[: len(_NEVER_DRIVER_VERIFIED) + 2])
    outside = sorted(_NEVER_DRIVER_VERIFIED - window)
    assert not outside, (
        "never-driver-verified queries outside the first "
        f"{len(_NEVER_DRIVER_VERIFIED) + 2} registry slots: {outside}"
    )


def test_registry_order_matches_risk_order_prefix():
    assert list(REGISTRY)[: len(_RISK_ORDER)] == [n for n in _RISK_ORDER if n in REGISTRY]
