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
# 4: the six queries the driver has never sampled, the one red row of
# r4 (quality_classifier_score, float-hash — output rebuilt as scaled
# BIGINTs in r5), and every query whose output schema was quantized in
# r5 (rounded-double columns re-emitted as *_e4/_e6/_x10 BIGINTs), so
# the old green rows no longer attest the current output.
_NEVER_DRIVER_VERIFIED = {
    # never sampled r1-r4
    "ann_topk_incremental",
    "incremental_agg_retract",
    "incremental_join",
    "incremental_join_retract",
    "sequence_funnel",
    "table_profile",
    # red in r4
    "quality_classifier_score",
    # output schema quantized in r5
    "semdedup_pairs",
    "semdedup_survivors",
    "cluster_purity",
    "incremental_ingest_dedup",
    "corpus_card",
    "text_quality",
    "ngram_jaccard_pairs",
    "tfidf_top_terms",
    "weighted_sample",
    "repetition_score",
    "tokenizer_fertility",
    "stats_battery",
    "approx_quantile_check",
    "json_extract",
    "substring_heuristics",
    "numeric_functions",
    "national_market_share",
    "morphology_battery",
    "asc_morphology_battery",
    "h5_morphology_battery",
    "conversion_roundtrip_battery",
    "morphology_tree_metrics",
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_multiprobe",
    "ann_pq",
    "ann_ivf_persisted",
    "embedding_near_dup",
    "embedding_near_dup_multiprobe",
    "embedding_dup_clusters",
    "embedding_outliers",
    "knn_classify",
    "hybrid_search_rrf",
    # new in r5
    "jpeg_native_decode",
    "wav_native_audio",
    "kmeans_clusters_table",
    "ann_ivf_pq",
    "dedup_consensus",
    "domain_reweight",
    "drift_psi",
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
