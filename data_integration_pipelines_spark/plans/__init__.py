"""Query plan registry. Importing this package registers all queries."""

from __future__ import annotations

from .base import REGISTRY, Query, register

from . import queries_relational  # noqa: E402,F401
from . import queries_scalar  # noqa: E402,F401
from . import queries_domain  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
from . import queries_vector  # noqa: E402,F401
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
    # -- never driver-verified in rounds 1-2 (registry positions >50) --
    # ANN / embedding similarity (Python kernels, LSH bucketing)
    "ann_pq",
    "ann_bruteforce",
    "ann_ivf",
    "ann_ivf_multiprobe",
    "embedding_near_dup",
    "embedding_near_dup_multiprobe",
    "embedding_dup_clusters",
    "int8_quantize",
    "hybrid_search_rrf",
    # morphology / voxel kernels (applyInPandas walks, binary parsers)
    "morphology_battery",
    "asc_morphology_battery",
    "h5_morphology_battery",
    "conversion_roundtrip_battery",
    "morphology_tree_metrics",
    "voxel_region_lookup",
    "voxel_region_histogram",
    # temporal joins + window/session suite
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
    # curation additions beyond the round-1 set
    "tfidf_top_terms",
    "bm25_search",
    "pii_redaction",
    "duplicated_span_fraction",
    "mixture_temperature",
    "weighted_sample",
    "skyline_docs",
    "repetition_score",
    "quality_rule_battery",
    "chunk_documents",
    "curation_funnel",
    "incremental_agg",
    # multimodal plumbing
    "multimodal_meta",
    "frame_sample",
    "image_resize",
    "audio_features",
    "image_decode_features",
    "png_decode_features",
    "jwt_decode",
    # domain joins
    "part_of_expansion",
    "two_hop_follow",
    "two_hop_follow_bucketed",
    "relationship_assign",
    "anti_join_orphans",
    # star-join suite (new in r3: no driver row yet by construction)
    "shipping_priority",
    "local_supplier_volume",
    "promo_revenue",
    "top_supplier",
    "returned_items_report",
    "forecast_revenue",
    "large_volume_customers",
    "customer_order_distribution",
    "dormant_rich_customers",
    # bloom-prefiltered decontamination (new in r3)
    "decontaminate_bloom",
    # quantile-sketch bounds check (new in r3)
    "approx_quantile_check",
    # embedding classification / outlier screens (new in r3)
    "knn_classify",
    "embedding_outliers",
    # iterative graph ranking (new in r3)
    "nation_pagerank",
    "nation_pagerank_weighted",
    # incremental join-view maintenance (new in r3)
    "incremental_join",
    "incremental_join_retract",
    "incremental_agg_retract",
    "ann_topk_incremental",
    # ordered 3-step sequence detection (new in r3)
    "sequence_funnel",
    # ANALYZE-style data profile (new in r3)
    "table_profile",
    # -- driver-green in r1+r2; heaviest / multi-stage first --
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
    # trivial scalar-function queries: least likely to regress
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
