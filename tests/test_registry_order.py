"""Registry-order pins.

The driver's CORRECTNESS sweep is time-budgeted and visits queries in
registry order (it stopped at the first 50 entries in rounds 1 and 2).
These pins keep the verification-risk ordering honest: the kernels that
had no driver row through round 2 must sit inside the budget window,
and the explicit order list must stay in sync with the registry.
"""

from __future__ import annotations

from data_integration_pipelines_spark.plans import _RISK_ORDER, REGISTRY

# Every query needing a fresh GREEN driver CORRECTNESS row after round
# 5: queries whose OUTPUT was rebuilt by the round-6 quantized-sum
# back-port (money sums now emitted through exact DECIMAL(18,6);
# pricing_summary's averages became *_e4 BIGINT columns;
# upsert_classify's compared value became cent BIGINTs — old green
# rows no longer attest the current output), plus queries new in r6.
_NEVER_DRIVER_VERIFIED = {
    # output rebuilt in r6 (quantized-sum back-port)
    "pricing_summary",
    "upsert_classify",
    "two_hop_follow",
    "two_hop_follow_bucketed",
    "cross_bucket_rollup",
    "join_enrich",
    "census_rollup",
    "salted_aggregation",
    "windowed_event_counts",
    "windowed_counts_pruned",
    "running_total",
    "stats_battery",
    "range_join_binned",
    "quantile_bins",
    # new in r6
    "ann_topk_join_bulk",
    "flac_native_audio",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "embedding_near_dup_probed",
    "training_chunks",
    "contamination_fraction",
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
