"""Registry-order pins.

The driver's CORRECTNESS sweep is time-budgeted and visits queries in
registry order (it stopped at the first 50 entries in rounds 1 and 2).
These pins keep the verification-risk ordering honest: the kernels that
had no driver row through round 2 must sit inside the budget window,
and the explicit order list must stay in sync with the registry.
"""

from __future__ import annotations

from data_integration_pipelines_spark.plans import _RISK_ORDER, REGISTRY

# Every query that had NO driver CORRECTNESS row in rounds 1-2 (it sat
# beyond the ~50-entry sweep budget both rounds).
_NEVER_DRIVER_VERIFIED = {
    "ann_pq",
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_multiprobe",
    "embedding_near_dup",
    "embedding_near_dup_multiprobe",
    "embedding_dup_clusters",
    "int8_quantize",  # new in r3: no driver row yet by construction
    "hybrid_search_rrf",  # new in r3: no driver row yet by construction
    "morphology_battery",
    "asc_morphology_battery",
    "h5_morphology_battery",  # new in r3: no driver row yet by construction
    "conversion_roundtrip_battery",  # new in r3: no driver row yet

    "morphology_tree_metrics",
    "voxel_region_lookup",
    "voxel_region_histogram",
    "asof_join_events",
    "asof_join_events_chunked",  # new in r3: no driver row yet
    "range_join_binned",
    "session_stats",
    "session_window_counts",
    "windowed_event_counts",
    "windowed_counts_pruned",  # new in r3: no driver row yet
    "running_total",
    "lag_lead_deltas",
    "rank_battery",
    "stats_battery",
    "value_histogram",
    "drop_duplicates",
    "count_compare",
    "grouped_topk",
    "event_funnel",
    "pivot_event_matrix",
    "cube_census",
    "quantile_bins",
    "tfidf_top_terms",
    "bm25_search",  # new in r3: no driver row yet by construction
    "pii_redaction",  # new in r3: no driver row yet by construction
    "duplicated_span_fraction",  # new in r3: no driver row yet
    "mixture_temperature",  # new in r3: no driver row yet by construction
    "weighted_sample",
    "skyline_docs",
    "repetition_score",
    "quality_rule_battery",
    "chunk_documents",
    "curation_funnel",
    "incremental_agg",  # new in r3: no driver row yet by construction
    "multimodal_meta",
    "frame_sample",
    "image_resize",
    "audio_features",
    "image_decode_features",
    "png_decode_features",  # new in r3: no driver row yet by construction
    "jwt_decode",  # new in r3: no driver row yet by construction
    "part_of_expansion",
    "two_hop_follow",
    "two_hop_follow_bucketed",
    "relationship_assign",
    "anti_join_orphans",
    "shipping_priority",  # new in r3: no driver row yet by construction
    "local_supplier_volume",  # new in r3: no driver row yet by construction
    "promo_revenue",  # new in r3: no driver row yet by construction
    "top_supplier",  # new in r3: no driver row yet by construction
    "returned_items_report",  # new in r3: no driver row yet by construction
    "decontaminate_bloom",  # new in r3: no driver row yet by construction
    "approx_quantile_check",  # new in r3: no driver row yet by construction
    "knn_classify",  # new in r3: no driver row yet by construction
    "embedding_outliers",  # new in r3: no driver row yet by construction
    "nation_pagerank",  # new in r3: no driver row yet by construction
    "incremental_join",  # new in r3: no driver row yet by construction
    "forecast_revenue",  # new in r3: no driver row yet by construction
    "large_volume_customers",  # new in r3: no driver row yet by construction
    "incremental_join_retract",  # new in r3: no driver row yet by construction
    "incremental_agg_retract",  # new in r3: no driver row yet by construction
    "ann_topk_incremental",  # new in r3: no driver row yet by construction
    "sequence_funnel",  # new in r3: no driver row yet by construction
    "nation_pagerank_weighted",  # new in r3: no driver row yet by construction
    "table_profile",  # new in r3: no driver row yet by construction
    "customer_order_distribution",  # new in r3: no driver row yet by construction
    "dormant_rich_customers",  # new in r3: no driver row yet by construction
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
