"""Registry-order pins.

The driver's CORRECTNESS sweep is time-budgeted and visits queries in
registry order (it stopped at the first 50 entries in rounds 1 and 2).
These pins keep the verification-risk ordering honest: the kernels that
had no driver row through round 2 must sit inside the budget window,
and the explicit order list must stay in sync with the registry.
"""

from __future__ import annotations

from data_integration_pipelines_spark.plans import _RISK_ORDER, REGISTRY

# Every query with no GREEN driver CORRECTNESS row through round 3:
# the 31 never-sampled queries, pii_redaction (red in r3 -- oracle-SQL
# dtype bug fixed in r4), embedding_outliers (same class of fix), and
# queries new in r4.
_NEVER_DRIVER_VERIFIED = {
    "ann_topk_incremental",
    "anti_join_orphans",
    "approx_quantile_check",
    "audio_features",
    "customer_order_distribution",
    "decontaminate_bloom",
    "dormant_rich_customers",
    "embedding_outliers",
    "forecast_revenue",
    "image_decode_features",
    "image_resize",
    "incremental_agg_retract",
    "incremental_join",
    "jpeg_decode_features",
    "order_priority_checking",
    "volume_shipping",
    "national_market_share",
    "small_quantity_revenue",
    "disjunctive_brand_revenue",
    "waiting_orders_suppliers",
    "train_val_test_split",
    "kmeans_clusters",
    "semdedup_pairs",
    "semdedup_survivors",
    "incremental_ingest_dedup",
    "cms_token_freq",
    "quality_classifier_score",
    "exact_substring_removal",
    "corpus_card",
    "next_event_training_pairs",
    "contrastive_pairs",
    "tokenizer_fertility",
    "cluster_purity",
    "ann_ivf_persisted",
    "rare_token_suppression",
    "incremental_join_retract",
    "jwt_decode",
    "knn_classify",
    "large_volume_customers",
    "local_supplier_volume",
    "nation_pagerank",
    "nation_pagerank_weighted",
    "part_of_expansion",
    "pii_redaction",
    "png_decode_features",
    "promo_revenue",
    "region_agreement",
    "relationship_assign",
    "returned_items_report",
    "sequence_funnel",
    "shipping_priority",
    "table_profile",
    "top_supplier",
    "two_hop_follow",
    "two_hop_follow_bucketed",
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
    window = set(order[: len(_NEVER_DRIVER_VERIFIED) + 1])  # +1 flagship
    outside = sorted(_NEVER_DRIVER_VERIFIED - window)
    assert not outside, (
        "never-driver-verified queries outside the first "
        f"{len(_NEVER_DRIVER_VERIFIED) + 1} registry slots: {outside}"
    )


def test_registry_order_matches_risk_order_prefix():
    assert list(REGISTRY)[: len(_RISK_ORDER)] == [n for n in _RISK_ORDER if n in REGISTRY]
