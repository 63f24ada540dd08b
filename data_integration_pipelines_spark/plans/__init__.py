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
# in rounds 1-2). Order by VERIFICATION RISK, not by module, with a
# ROTATION slice (r8, VERDICT r7 task 7): risk-ordering the head is
# right, but queries that stay stable forever would otherwise never
# earn a fresh DRIVER row again (judge sweeps cover them, the driver's
# head hasn't since r2-r4) — so each round also cycles the
# longest-unvisited stable-tail queries into the head. Round-11 head:
# (a) the six NEW queries (per-language LM models — CCNet's actual
# per-lang mechanism —, the at-scale approx ppl-bucket route, the
# leakage-safe split's per-doc manifest), then the queries whose PLAN
# changed this round with unchanged fixture output (the ngram_lm_scores
# model bucket-range guard, ADVICE r10);
# (b) the rotation slice (VERDICT r10 task 1): the FULL 51-query
# r2-r4 stale tail, VERDICT-named entries and the TPC-H family first
# then oldest-first — the driver's ~50-row budget burns it to
# single digits this round and r12 finishes it;
# (c) the r10 head order for the rest.
_RISK_ORDER = [
    # (a) new in r11, never driver-compared: the seeded global-shuffle
    # shard manifest, the corpus distinct-n diversity metric, the
    # per-language LM family (CCNet's actual per-lang construction),
    # the registered at-scale ppl-bucket route, the leakage-safe split
    # manifest; the Gopher battery + gates (Rae et al. 2021 Table A1,
    # late-r11: repetition rules, document rules, the complete filter)
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
    # r11-changed plans, same fixture output: ngram_lm_scores gained
    # the codegen'd model bucket-range guard (ADVICE r10)
    "ngram_lm_perplexity",
    "ccnet_ppl_buckets",
    # (b) rotation slice (VERDICT r10 task 1): the 51 queries last
    # driver-verified r2-r4 — VERDICT-named entries and the TPC-H
    # family first, then oldest-first (r2, r3, r4)
    "relationship_assign",
    "part_of_expansion",
    "region_agreement",
    "anti_join_orphans",
    "jwt_decode",
    "order_priority_checking",
    "volume_shipping",
    "small_quantity_revenue",
    "disjunctive_brand_revenue",
    "waiting_orders_suppliers",
    "shipping_priority",
    "local_supplier_volume",
    "promo_revenue",
    "top_supplier",
    "returned_items_report",
    "forecast_revenue",
    "large_volume_customers",
    "customer_order_distribution",
    "dormant_rich_customers",
    "corpus_sample_mix",
    "asof_join_events",
    "asof_join_events_chunked",
    "bm25_search",
    "chunk_documents",
    "cube_census",
    "curation_funnel",
    "duplicated_span_fraction",
    "frame_sample",
    "incremental_agg",
    "int8_quantize",
    "mixture_temperature",
    "multimodal_meta",
    "pivot_event_matrix",
    "quality_rule_battery",
    "skyline_docs",
    "voxel_region_histogram",
    "voxel_region_lookup",
    "train_val_test_split",
    "decontaminate_bloom",
    "nation_pagerank",
    "nation_pagerank_weighted",
    "cms_token_freq",
    "exact_substring_removal",
    "next_event_training_pairs",
    "contrastive_pairs",
    "rare_token_suppression",
    "audio_features",
    "image_resize",
    "image_decode_features",
    "png_decode_features",
    "jpeg_decode_features",
    # (c) the r10 head order for the rest, minus entries moved above
    "leakage_safe_split",
    "ccnet_funnel",
    "ngram_lm_ctx_model",
    "boilerplate_removal_lines",
    "incremental_boilerplate_lines",
    "boilerplate_lines",
    "dsir_importance_scores_bigram",
    "dsir_bucket_model_bigram",
    "boilerplate_removal",
    "incremental_boilerplate",
    "boilerplate_then_exact_dedup",
    "dsir_importance_scores",
    "zipf_fit",
    "type_census",
    "census_filtered",
    "bool_folds",
    "exists_filter",
    "optional_bound",
    "link_integrity",
    "set_discrepancy",
    "union_distinct",
    "approx_distinct_check",
    "completeness_check",
    "filter_dsl_search",
    "keep_latest",
    "keep_latest_salted",
    "hierarchy_closure",
    "closure_descendant_counts",
    "sibling_pairs",
    "session_stats",
    "session_window_counts",
    "lag_lead_deltas",
    "rank_battery",
    "value_histogram",
    "drop_duplicates",
    "count_compare",
    "grouped_topk",
    "event_funnel",
    "token_freq_spectrum",
    "dsir_resample_topk",
    "dsir_bucket_model",
    "boilerplate_segments",
    "exact_then_near_dup",
    "embedding_near_dup_probed_uncapped",
    "incremental_embedding_dedup",
    "embedding_near_dup_probed",
    "dedup_consensus",
    "embedding_dup_clusters",
    "embedding_near_dup_probed_capped",
    "quality_stratified_sample",
    "quality_stratified_sample_ranked",
    "quantile_bins",
    "semdedup_keep_ids",
    "semdedup_survivors",
    "semdedup_pairs",
    "exact_dedup",
    "doc_fingerprint",
    "dedup_survivors",
    "dup_clusters",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "simhash_hamming_pairs",
    "decontaminate",
    "char_ngram_lang_id",
    "lang_id",
    "kmeans_assign_pivoted",
    "semdedup_survivors_pivoted",
    "semdedup_survivors_auto_k",
    "quantile_bins_approx",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "contamination_fraction_wide_eval",
    "encode_normalize",
    "sparse_bool_render",
    "date_functions",
    "case_convert",
    "regex_extract",
    "in_list_filter",
    "string_predicates",
    "paginated_scan",
    "top_k",
    "error_grouping",
    "training_chunks_single_source",
    "token_pack_bins",
    "training_chunks",
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
    "ann_topk_join_bulk",
    "flac_native_audio",
    "contamination_fraction",
    "quality_classifier_score",
    "ann_topk_incremental",
    "incremental_agg_retract",
    "incremental_join",
    "incremental_join_retract",
    "sequence_funnel",
    "table_profile",
    "cluster_purity",
    "kmeans_clusters",
    "incremental_ingest_dedup",
    "corpus_card",
    "text_quality",
    "ngram_jaccard_pairs",
    "tfidf_top_terms",
    "weighted_sample",
    "repetition_score",
    "tokenizer_fertility",
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
    "embedding_outliers",
    "knn_classify",
    "hybrid_search_rrf",
    "jpeg_native_decode",
    "wav_native_audio",
    "kmeans_clusters_table",
    "ann_ivf_pq",
    "domain_reweight",
    "drift_psi",
    "pii_redaction",
]


def _apply_risk_order() -> None:
    ordered = {n: REGISTRY[n] for n in _RISK_ORDER if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_risk_order()

__all__ = ["REGISTRY", "Query", "register"]
