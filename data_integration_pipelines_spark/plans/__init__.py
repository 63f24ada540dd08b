"""Query plan registry. Importing this package registers all queries."""

from __future__ import annotations

from .base import REGISTRY, Query, register

from . import queries_relational  # noqa: E402,F401
from . import queries_scalar  # noqa: E402,F401
from . import queries_domain  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
from . import queries_vector  # noqa: E402,F401
from . import queries_clustering  # noqa: E402,F401
from . import queries_morphology  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_joins  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_voxel  # noqa: E402,F401
from . import queries_window  # noqa: E402,F401

# Registry order == the order the driver's time-budgeted CORRECTNESS
# sweep visits queries (it stops when its budget runs out, ~50 entries
# in rounds 1-2). Order by VERIFICATION RISK, not by module: the
# Python-kernel / multi-stage operators (ANN, morphology, voxel,
# window/temporal, curation) that are hardest to keep correct go
# first; the trivial scalar-function queries that are least likely to
# break go last. Names missing from the list (new queries) keep their
# registration order at the end until triaged into a slot.
_RISK_ORDER = [
    # flagship first (pays the one-off JVM/codegen warmup regardless)
    "pricing_summary",
    # -- r4 priority: oracle-SQL fixed this round (dtype drift), must re-verify --
    "pii_redaction",
    "embedding_outliers",
    # -- new in r4 --
    "region_agreement",
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
    # -- never driver-sampled in rounds 1-3 (judge-verified only) --
    "image_resize",
    "audio_features",
    "image_decode_features",
    "png_decode_features",
    "jwt_decode",
    "part_of_expansion",
    "two_hop_follow",
    "two_hop_follow_bucketed",
    "relationship_assign",
    "anti_join_orphans",
    "shipping_priority",
    "local_supplier_volume",
    "promo_revenue",
    "top_supplier",
    "returned_items_report",
    "forecast_revenue",
    "large_volume_customers",
    "customer_order_distribution",
    "dormant_rich_customers",
    "decontaminate_bloom",
    "approx_quantile_check",
    "knn_classify",
    "nation_pagerank",
    "nation_pagerank_weighted",
    "incremental_join",
    "incremental_join_retract",
    "incremental_agg_retract",
    "ann_topk_incremental",
    "sequence_funnel",
    "table_profile",
    # -- driver-green in r1-r3; heaviest / multi-stage first --
    "ann_pq",
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_multiprobe",
    "embedding_near_dup",
    "embedding_near_dup_multiprobe",
    "embedding_dup_clusters",
    "int8_quantize",
    "hybrid_search_rrf",
    "morphology_battery",
    "asc_morphology_battery",
    "h5_morphology_battery",
    "conversion_roundtrip_battery",
    "morphology_tree_metrics",
    "voxel_region_lookup",
    "voxel_region_histogram",
    "asof_join_events",
    "asof_join_events_chunked",
    "range_join_binned",
    "session_stats",
    "session_window_counts",
    "windowed_event_counts",
    "windowed_counts_pruned",
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
    "bm25_search",
    "duplicated_span_fraction",
    "mixture_temperature",
    "weighted_sample",
    "skyline_docs",
    "repetition_score",
    "quality_rule_battery",
    "chunk_documents",
    "curation_funnel",
    "incremental_agg",
    "multimodal_meta",
    "frame_sample",
    "dup_clusters",
    "dedup_survivors",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "simhash_hamming_pairs",
    "decontaminate",
    "corpus_sample_mix",
    "quality_stratified_sample",
    "token_pack_bins",
    "exact_dedup",
    "doc_fingerprint",
    "char_ngram_lang_id",
    "text_quality",
    "lang_id",
    "hierarchy_closure",
    "closure_descendant_counts",
    "sibling_pairs",
    "upsert_classify",
    "completeness_check",
    "keep_latest",
    "keep_latest_salted",
    "filter_dsl_search",
    "link_integrity",
    "set_discrepancy",
    "union_distinct",
    "join_enrich",
    "exists_filter",
    "optional_bound",
    "approx_distinct_check",
    "salted_aggregation",
    "census_rollup",
    "cross_bucket_rollup",
    "type_census",
    "census_filtered",
    "bool_folds",
    "error_grouping",
    "top_k",
    "paginated_scan",
    "string_predicates",
    "in_list_filter",
    "regex_extract",
    "case_convert",
    "date_functions",
    "json_extract",
    "sparse_bool_render",
    "substring_heuristics",
    "numeric_functions",
    "encode_normalize",
]


def _apply_risk_order() -> None:
    ordered = {n: REGISTRY[n] for n in _RISK_ORDER if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_risk_order()

__all__ = ["REGISTRY", "Query", "register"]
