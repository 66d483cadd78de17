"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Float policy (see snomed_ct_entity_linking_ray/pipelines/common.py): every
value that crosses the oracle boundary is an integer (exact cents), a
timestamp, or a string — except single-expression doubles (bit-exact) —
so value hashes are deterministic across engines.

No ray.init/ray.shutdown anywhere in this module or the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: entity linking over the interleaved-span fixture
    docs at sf0.001 scale (read → sectionize/flatten → automaton blocking →
    pair scoring → clustering → overlap resolution)."""
    from snomed_ct_entity_linking_ray.pipelines.entity_link import run_entity_link

    return run_entity_link("/root/testdata/sf0.001")


# Queries whose implementation changed in round 4 AFTER their last green
# CORRECTNESS row: a green row only counts if recorded in round >= 4.
_REGATE_FROM_ROUND = {
    name: 4
    for name in (
        "entity_link", "sessionize", "rolling_user_value",
        "first_event_per_user", "user_event_type_counts",
        "ngram_jaccard_pairs", "llm_ner", "entity_link_mentions",
        "entity_link_eval_iou", "cohort_retention",
        "latest_order_before_event", "json_field_sum",
    )
}
# r4x helper extraction (_ivf_probe / _pq_train) touched these two r03-green
# paths; output-identical and rehearsal-pinned, but re-gate them in r5
_REGATE_FROM_ROUND.update({"cosine_topk_ivf": 5, "pq_codes": 5})
# r5 rewrites (VERDICT r4 #2/#3/#4 + ADVICE r4): the fuzzy-graph family's
# distributed id assignment + DuckDB-kernel scoring, ann_recall's
# broadcast join, and the edge-case guards — all rehearsal-pinned
# output-identical on the fixtures, but their r4 rows predate the change
_REGATE_FROM_ROUND.update({
    name: 5
    for name in (
        "name_clusters", "cc_pivot", "bfs_depth", "weakest_link",
        "two_hop_reach", "progressive_er", "match_pagerank", "ann_recall",
        "json_field_sum", "quantile_sketch", "type_cooccurrence",
        "blocking_compare", "kcenter_coreset", "source_similarity",
        "ks_lengths",
        # direct rewrites of the blocked-verification kernel (batch_jw
        # swap — VERDICT r4 #4; downstream consumers of the pair stream
        # are value-identical by the property-test pin and all
        # rehearsal-green)
        "fuzzy_name_pairs", "salted_pairs",
        # r5 shuffle-free iterative rounds (the per-round groupby
        # exchanges belong to the scheduler-stall class stable_matching
        # reproduced on a fresh session; all oracle-exact re-verified)
        "stable_matching", "greedy_assignment", "kcore",
        # r5 batch_jw swap in the two-source candidate generator
        "crosslink_best",
    )
})

# Round-5 gate priority (VERDICT r4 #1 "gate, don't grow"): within the
# pending tier, SURVEY-mapped stale queries and this round's rewrites
# outrank the never-gated backlog, which in turn is led by the
# dedup/ANN/training family the verdict names. Names not listed keep
# their curated registry order after these.
_GATE_PRIORITY = (
    # SURVEY-mapped stale (rewritten after their last green driver row)
    "entity_link_mentions", "llm_ner", "entity_link_eval_iou",
    "cohort_retention", "latest_order_before_event", "json_field_sum",
    "cosine_topk_ivf", "pq_codes",
    # r5 rewrites (re-gate)
    "cc_pivot", "bfs_depth", "weakest_link", "two_hop_reach",
    "progressive_er", "name_clusters", "match_pagerank", "ann_recall",
    "quantile_sketch", "blocking_compare", "kcenter_coreset",
    "source_similarity", "ks_lengths", "type_cooccurrence",
    # highest-value never-gated (dedup / ANN / training-data family)
    "dedup_keep_best", "dedup_weights", "segment_dedup",
    "decontaminate_bloom", "substring_contamination", "bpe_merges",
    "bpe_tokens", "knn_join", "ivf_pq_topk", "hard_negatives",
    "knn_classify", "mmr_topk", "chunk_overlap", "mix_sources",
    "salted_pairs", "kmv_users", "em_weights", "lm_perplexity",
    "char_entropy", "rake_phrases", "scd2_history", "cdc_state",
    "k_anonymity", "dq_checks", "media_context", "media_dup_docs",
    "stable_matching", "fuzzy_name_pairs",
)


def _green_rounds() -> dict[str, int]:
    """Latest round with a hash-green CORRECTNESS row per query, read from
    the driver's own CORRECTNESS_r*.json records next to this file."""
    import glob
    import json
    import os
    import re

    latest: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                d = json.load(f)
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        for k, v in d.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match") and v.get("schema_match")
                and v.get("hash_match") and not v.get("err")
            ):
                latest[k] = max(latest.get(k, -1), rnd)
    return latest


def _gate_order(reg: dict, green: dict | None = None) -> dict:
    """SELF-MAINTAINING gate order (the driver hash-gates the FIRST 50
    entries per round): queries still needing a green row — never gated,
    or rewritten after their last green row (``_REGATE_FROM_ROUND``) —
    come first, the satisfied rest after, each tier preserving the
    curated registry order below. Once the driver records a green row
    the query drops to the back automatically, so the next round's gate
    rotates to the next never-gated batch without a manual reorder
    (VERDICT r3 #3, made durable)."""
    if green is None:
        green = _green_rounds()

    def satisfied(name: str) -> bool:
        return green.get(name, -1) >= _REGATE_FROM_ROUND.get(name, 0)

    prio = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    reg_pos = {n: i for i, n in enumerate(reg)}
    pending_names = sorted(
        (k for k in reg if not satisfied(k)),
        key=lambda k: (prio.get(k, len(prio)), reg_pos[k]),
    )
    pending = {k: reg[k] for k in pending_names}
    done = {k: v for k, v in reg.items() if satisfied(k)}
    return {**pending, **done}


def queries() -> dict[str, Callable[[str], Any]]:
    from snomed_ct_entity_linking_ray.pipelines import (
        compose,
        dedup,
        dict_train,
        entity_link,
        er,
        llm,
        multimodal,
        relational,
        text,
        training,
        vectors,
    )

    # ORDER MATTERS: the driver gates the FIRST 50 entries per round;
    # _gate_order reorders this curated registry so queries without a
    # (current) green CORRECTNESS row come first. The literal order below
    # is the within-tier priority.
    return _gate_order({
        # never driver-gated before r4
        "cosine_topk_lsh": vectors.q_cosine_topk_lsh,
        "span_stats": multimodal.q_span_stats,
        "media_bucket_pairs": multimodal.q_media_bucket_pairs,
        # r4-changed paths whose last green row predates the change:
        # llm_ner/entity_link were last gated in r02 and the link-state
        # cache + FreqSink rewrite touched them; the four bucketed
        # streaming rewrites and the two scaled-bucket queries carry r03
        # rows from BEFORE their r4 rewrite (VERDICT items 1/4 ask for
        # CORRECTNESS_r4 rows); json_field_sum's parse was fixed (ADVICE
        # medium); phonetic_pairs is new in r4e and never gated.
        "phonetic_pairs": er.q_phonetic_pairs,
        "first_event_per_user": relational.q_first_event_per_user,
        "user_event_type_counts": relational.q_user_event_type_counts,
        "entity_link": entity_link.q_entity_link,
        # never gated: r4f cluster-quality evaluation, canopy blocking,
        # incremental linkage, FS decision rule, interleaved context join,
        # suffix-array blocking
        "cluster_metrics": er.q_cluster_metrics,
        "canopy_pairs": er.q_canopy_pairs,
        "link_increment": er.q_link_increment,
        "match_classify": er.q_match_classify,
        "media_nearest": multimodal.q_media_nearest,
        "suffix_pairs": er.q_suffix_pairs,
        # new in r4
        "event_gaps": relational.q_event_gaps,
        "shipping_priority": relational.q_shipping_priority,
        "local_supplier_volume": relational.q_local_supplier_volume,
        "redact_terms": text.q_redact_terms,
        "quality_filter": text.q_quality_filter,
        "bigram_lift": text.q_bigram_lift,
        # entity-resolution blocking family (new in r4)
        "fuzzy_name_pairs": er.q_fuzzy_name_pairs,
        "sorted_neighborhood_pairs": er.q_sorted_neighborhood_pairs,
        "customer_order_distribution": relational.q_customer_order_distribution,
        "sliding_activity": relational.q_sliding_activity,
        "kmeans_clusters": vectors.q_kmeans_clusters,
        "order_event_window": relational.q_order_event_window,
        "posting_lists": text.q_posting_lists,
        "funnel_conversion": relational.q_funnel_conversion,
        "match_patterns": er.q_match_patterns,
        "golden_user_profile": er.q_golden_user_profile,
        "name_clusters": er.q_name_clusters,
        "match_weights": er.q_match_weights,
        "blocking_metrics": er.q_blocking_metrics,
        "metablocking_pairs": er.q_metablocking_pairs,
        "match_roc": er.q_match_roc,
        # new in r4e — never gated, so they take prefix slots ahead of the
        # re-gates below (the re-gates' rewrites are output-identical and
        # hold r03 hash-green rows + the identical in-repo rehearsal)
        "order_priority_count": relational.q_order_priority_count,
        "volume_shipping": relational.q_volume_shipping,
        "returned_items": relational.q_returned_items,
        "promo_revenue": relational.q_promo_revenue,
        "large_volume_customers": relational.q_large_volume_customers,
        "disjunctive_revenue": relational.q_disjunctive_revenue,
        "sales_opportunity": relational.q_sales_opportunity,
        "event_type_pivot": relational.q_event_type_pivot,
        "event_seq": relational.q_event_seq,
        "mutual_best_pairs": er.q_mutual_best_pairs,
        "pair_features": er.q_pair_features,
        # new in r4d: decorrelated scalar subquery + conditional share
        "small_qty_revenue": relational.q_small_qty_revenue,
        "market_share": relational.q_market_share,
        # the 3 deepest r4 rewrites re-gate inside the prefix (prefix-filter
        # blocking; per-user map_groups → bucketed vectorized kernels)
        "ngram_jaccard_pairs": dedup.q_ngram_jaccard_pairs,
        "sessionize": relational.q_sessionize,
        "rolling_user_value": relational.q_rolling_user_value,
        # --- driver prefix ends here (50): all 44 never-gated queries plus
        # the 6 highest-risk r4 rewrites (flagship + the four per-user
        # streaming rewrites + the re-blocked ngram_jaccard) ---------------
        # First in line for the r5 gate: queries ADDED after the r4 gate
        # order was frozen (never gated, rehearsal-verified)...
        "top_supplier": relational.q_top_supplier,
        "lone_return_supplier": relational.q_lone_return_supplier,
        "monge_elkan_pairs": er.q_monge_elkan_pairs,
        "cube_summary": relational.q_cube_summary,
        "exact_quantiles": relational.q_exact_quantiles,
        "shipmode_priority": relational.q_shipmode_priority,
        "bcubed_metrics": er.q_bcubed_metrics,
        "token_diversity": text.q_token_diversity,
        "length_band_filter": text.q_length_band_filter,
        "user_modal_event": relational.q_user_modal_event,
        "canonical_names": er.q_canonical_names,
        "length_cdf": text.q_length_cdf,
        "ari_metric": er.q_ari_metric,
        "edit_neighbors": er.q_edit_neighbors,
        "hamming_neighbors": er.q_hamming_neighbors,
        "oov_rate": text.q_oov_rate,
        "grouped_variance": relational.q_grouped_variance,
        "knn_classify": vectors.q_knn_classify,
        "prefix_dups": dedup.q_prefix_dups,
        "user_event_path": relational.q_user_event_path,
        "priority_revenue_share": relational.q_priority_revenue_share,
        "freq_of_freqs": text.q_freq_of_freqs,
        "multipass_pairs": er.q_multipass_pairs,
        "substring_contamination": training.q_substring_contamination,
        "event_transitions": relational.q_event_transitions,
        "hourly_distinct_users": relational.q_hourly_distinct_users,
        "next_event_after_order": relational.q_next_event_after_order,
        "mmr_topk": vectors.q_mmr_topk,
        "nation_profit": relational.q_nation_profit,
        "qualified_suppliers": relational.q_qualified_suppliers,
        "brand_supplier_counts": relational.q_brand_supplier_counts,
        "span_kind_signature": multimodal.q_span_kind_signature,
        "pair_triangles": er.q_pair_triangles,
        "char_entropy": text.q_char_entropy,
        "em_weights": er.q_em_weights,
        "value_histogram": relational.q_value_histogram,
        "strip_media_remap": multimodal.q_strip_media_remap,
        "lm_perplexity": text.q_lm_perplexity,
        "late_events": relational.q_late_events,
        "segment_runs": relational.q_segment_runs,
        "pq_codes": vectors.q_pq_codes,
        "soft_tfidf_pairs": er.q_soft_tfidf_pairs,
        "dup_rate_by_source": dedup.q_dup_rate_by_source,
        "decontaminate_bloom": training.q_decontaminate_bloom,
        "qgram_overlap_pairs": er.q_qgram_overlap_pairs,
        "audience_overlap": relational.q_audience_overlap,
        "media_context": multimodal.q_media_context,
        "value_outliers": relational.q_value_outliers,
        "match_degree_hist": er.q_match_degree_hist,
        "dedup_keep_best": dedup.q_dedup_keep_best,
        "ann_recall": vectors.q_ann_recall,
        "latest_user_state": relational.q_latest_user_state,
        "grouped_corr": relational.q_grouped_corr,
        "table_checksum": relational.q_table_checksum,
        "weighted_sample": training.q_weighted_sample,
        "bpe_merges": training.q_bpe_merges,
        "user_first_last": relational.q_user_first_last,
        "top2_gap": relational.q_top2_gap,
        "transitive_pairs": er.q_transitive_pairs,
        "order_latency": relational.q_order_latency,
        "top_words_per_lang": text.q_top_words_per_lang,
        "compression_ratio": text.q_compression_ratio,
        "span_transitions": multimodal.q_span_transitions,
        "match_pagerank": er.q_match_pagerank,
        "simhash_pairs": dedup.q_simhash_pairs,
        "hourly_delta": relational.q_hourly_delta,
        "vocab_growth": text.q_vocab_growth,
        "rrf_fusion": text.q_rrf_fusion,
        "fk_audit": relational.q_fk_audit,
        "twa_user_value": relational.q_twa_user_value,
        "profile_columns": relational.q_profile_columns,
        "uncertain_pairs": er.q_uncertain_pairs,
        "ppjoin_pairs": dedup.q_ppjoin_pairs,
        "fully_returned_orders": relational.q_fully_returned_orders,
        "pareto_orders": relational.q_pareto_orders,
        "media_clusters": multimodal.q_media_clusters,
        "crosslink_best": er.q_crosslink_best,
        "greedy_assignment": er.q_greedy_assignment,
        "kcore": er.q_kcore,
        "pprl_pairs": er.q_pprl_pairs,
        "stable_matching": er.q_stable_matching,
        # ...then r4-changed paths with lower risk —
        # llm.py is UNCHANGED since r3-final (llm_ner risk is only the
        # shared common.py delta); mentions/eval_iou share the flagship's
        # gated path; cohort/asof changed only a bucket-count parameter;
        # json_field_sum's fix is output-identical on fixtures with the
        # field present. All six hold old green rows + the identical
        # in-repo sf0.01 rehearsal (tests/test_oracle_parity.py).
        "entity_link_mentions": entity_link.q_mentions,
        "entity_link_eval_iou": _q_eval_iou,
        "llm_ner": llm.q_llm_ner,
        "cohort_retention": relational.q_cohort_retention,
        "latest_order_before_event": relational.q_latest_order_before_event,
        "json_field_sum": relational.q_json_field_sum,
        # r02-green and UNCHANGED since (rehearsal-verified) — evicted from
        # the prefix to make room for the r4-changed rows above
        "encoder_topk": vectors.q_encoder_topk,
        "dict_majority": dict_train.q_dict_majority,
        "allowed_sections": dict_train.q_allowed_sections,
        "dict_precision": dict_train.q_dict_precision,
        "media_inventory": multimodal.q_media_inventory,
        "frame_samples": multimodal.q_frame_samples,
        # r03-hash-green; only an empty-batch guard changed since (ADVICE
        # low) — the r03 row remains representative
        "simhash_buckets": dedup.q_simhash_buckets,
        "hourly_user_activity": relational.q_hourly_user_activity,
        "customers_without_events": relational.q_customers_without_events,
        "parts_with_orders": relational.q_parts_with_orders,
        # relational operator family (SURVEY.md §2 S/J/G/T classes) —
        # unchanged since their r3 hash-green rows
        "top_orders_per_segment": relational.q_top_orders_per_segment,
        "approx_users": relational.q_approx_users,
        "filter_revenue": relational.q_filter_revenue,
        "pricing_summary": relational.q_pricing_summary,
        "orders_by_segment": relational.q_orders_by_segment,
        "customers_per_region": relational.q_customers_per_region,
        "top_orders": relational.q_top_orders,
        "rollup_summary": relational.q_rollup_summary,
        "grouped_median": relational.q_grouped_median,
        "customer_event_summary": relational.q_customer_event_summary,
        # declarative Stage composition surface (§2.10), driver-verified
        "compose_pipeline": compose.q_compose_pipeline,
        # text analysis family
        "unigrams": text.q_unigrams,
        "doc_stats": text.q_doc_stats,
        "token_count": text.q_token_count,
        "fingerprint": text.q_fingerprint,
        "term_match_first": text.q_term_match_first,
        "langid": text.q_langid,
        "llm_prompts": text.q_llm_prompts,
        "doc_freq": text.q_doc_freq,
        "bm25_topk": text.q_bm25_topk,
        "len_quantiles": text.q_len_quantiles,
        "sample_stratified": text.q_sample_stratified,
        # training-data preparation family
        "pack_sequences": training.q_pack_sequences,
        "decontaminate": training.q_decontaminate,
        "tfidf_topk": training.q_tfidf_topk,
        "novel_docs": training.q_novel_docs,
        "quality_score": training.q_quality_score,
        "repetition_stats": training.q_repetition_stats,
        "vocab_topk": training.q_vocab_topk,
        "sample_topk_hash": training.q_sample_topk_hash,
        "heavy_hitters": training.q_heavy_hitters,
        # dedup family
        "dedup_exact": dedup.q_dedup_exact,
        "minhash_lsh_pairs": dedup.q_minhash_lsh_pairs,
        "embedding_neardup_pairs": dedup.q_embedding_neardup_pairs,
        "winnow_dups": dedup.q_winnow_dups,
        "dup_clusters": dedup.q_dup_clusters,
        # similarity search family (lsh/encoder variants moved to the top)
        "cosine_topk": vectors.q_cosine_topk,
        "cosine_topk_ivf": vectors.q_cosine_topk_ivf,
        # r4q: TF adjustment, unlinkables chart, merged-cluster audit,
        # deterministic match-rule cascade
        "tf_adjustment": er.q_tf_adjustment,
        "unlinkables": er.q_unlinkables,
        "cluster_conflicts": er.q_cluster_conflicts,
        "rule_cascade": er.q_rule_cascade,
        # r4q: MAD robust outliers, banded range self-join, media-reel dedup
        "mad_outliers": relational.q_mad_outliers,
        "near_events": relational.q_near_events,
        "media_dup_docs": multimodal.q_media_dup_docs,
        # r4q: salting plan, Q2 min-cost shape, radius similarity search
        "block_skew_report": er.q_block_skew_report,
        "cheapest_supplier": relational.q_cheapest_supplier,
        "cosine_range": vectors.q_cosine_range,
        # r4q: collective-ER link prediction + threshold-stability audit
        "predicted_links": er.q_predicted_links,
        "threshold_stability": er.q_threshold_stability,
        # r4q: directed shingle-containment join + full kNN self-join
        "containment_pairs": dedup.q_containment_pairs,
        "knn_join": vectors.q_knn_join,
        # r4q: match-graph cohesion + FD profiling
        "clustering_coefficient": er.q_clustering_coefficient,
        "fd_violations": relational.q_fd_violations,
        # r4q: WNP meta-blocking pruning, triangle-free edge audit,
        # winsorized robust stats
        "wnp_pairs": er.q_wnp_pairs,
        "unsupported_edges": er.q_unsupported_edges,
        "winsorized_stats": relational.q_winsorized_stats,
        # r4q: cross-modal dup verification (media reel × text)
        "media_dup_text_check": multimodal.q_media_dup_text_check,
        # r4r: source-reliability data fusion, set-valued group linkage,
        # KwikCluster correlation clustering, C4-style segment dedup
        "truth_discovery": er.q_truth_discovery,
        "group_linkage": er.q_group_linkage,
        "cc_pivot": er.q_cc_pivot,
        "segment_dedup": dedup.q_segment_dedup,
        # r4s: data-lake join discovery, BPE tokenizer application,
        # contrastive hard-negative mining
        "join_discovery": relational.q_join_discovery,
        "bpe_tokens": training.q_bpe_tokens,
        "hard_negatives": vectors.q_hard_negatives,
        # r4t: executed key salting (same pair set as the unsalted
        # oracle), KMV bottom-k distinct sketch
        "salted_pairs": er.q_salted_pairs,
        "kmv_users": relational.q_kmv_users,
        # r4u: CDC merge apply, deterministic global shuffle index
        "cdc_state": relational.q_cdc_state,
        "shuffle_index": relational.q_shuffle_index,
        # r4v: per-pair Fellegi-Sunter waterfall explanation
        "match_explain": er.q_match_explain,
        # r4x: RAG chunking, mixture sampling, SCD2 history, Ditto pair
        # serialization, IVF-PQ ADC search
        "chunk_overlap": text.q_chunk_overlap,
        "mix_sources": text.q_mix_sources,
        "scd2_history": relational.q_scd2_history,
        "pair_serialize": er.q_pair_serialize,
        "ivf_pq_topk": vectors.q_ivf_pq_topk,
        # r4y: k-anonymity audit, calendar-spine densify, truncated-dim
        # retrieval eval, BFS depth diagnostics
        "k_anonymity": relational.q_k_anonymity,
        "dense_hourly": relational.q_dense_hourly,
        "dim_truncation_recall": vectors.q_dim_truncation_recall,
        "bfs_depth": er.q_bfs_depth,
        # r4z: soft-dedup weights, mergeable quantile sketch, RAKE
        "dedup_weights": dedup.q_dedup_weights,
        "quantile_sketch": relational.q_quantile_sketch,
        "rake_phrases": text.q_rake_phrases,
        # r4aa: weakest-link cluster audit, cross-source dup matrix
        "weakest_link": er.q_weakest_link,
        "source_overlap": dedup.q_source_overlap,
        # r4ab: greedy k-center coreset selection
        "kcenter_coreset": vectors.q_kcenter_coreset,
        # r4ac: pay-as-you-go progressive resolution curve
        "progressive_er": er.q_progressive_er,
        # r4ad: LTV decile lift, seasonal-naive forecast baseline
        "decile_lift": relational.q_decile_lift,
        "seasonal_naive": relational.q_seasonal_naive,
        # r4ae: type co-occurrence matrix, top principal component
        "type_cooccurrence": relational.q_type_cooccurrence,
        "top_component": vectors.q_top_component,
        # r4af: int8 serving-quant audit, marker-reset running totals
        "int8_quant_audit": vectors.q_int8_quant_audit,
        "reset_running_total": relational.q_reset_running_total,
        # r4ag: declarative DQ expectations, per-user activity-day gaps
        "dq_checks": relational.q_dq_checks,
        "user_day_gaps": relational.q_user_day_gaps,
        # r4ah: strict two-hop fringe audit
        "two_hop_reach": er.q_two_hop_reach,
        "join_size_estimate": relational.q_join_size_estimate,
        # r4ai: vocabulary histogram-intersection source matrix
        "source_similarity": text.q_source_similarity,
        "blocking_compare": er.q_blocking_compare,
        "ks_lengths": text.q_ks_lengths,
    })


def _q_eval_iou(sf_dir: str):
    """Golden-metric evaluation (G9): per-concept char IoU of the flagship
    pipeline's output vs the planted gold mentions (reference semantics:
    1st Place/src/scoring.py:10-47). Macro-IoU is 1.0 on fixtures because
    linkage is exact there."""
    import ray.data as rd

    from snomed_ct_entity_linking_ray import fixtures
    from snomed_ct_entity_linking_ray.functions.metrics import iou_per_concept
    from snomed_ct_entity_linking_ray.pipelines.entity_link import run_entity_link

    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    gold = rd.read_parquet(
        f"{fdir}/gold_mentions.parquet",
        columns=["doc_id", "start", "end", "concept_id"],
    )
    return iou_per_concept(run_entity_link(sf_dir), gold)


def _duck_path(p: str) -> str:
    """DuckDB read_parquet target: sharded fixture tables are directories."""
    import os

    return f"{p}/*.parquet" if os.path.isdir(p) else p


def oracle_sql() -> dict[str, str]:
    from snomed_ct_entity_linking_ray.pipelines.text import (
        PROMPT_CHUNK_TOKENS as _PCHUNK,
        PROMPT_SYS as _PSYS,
    )

    # Oracle-parquet generation + fixture paths for the non-SQL-expressible
    # queries: an INDEPENDENT single-process implementation writes expected
    # parquet (snomed_ct_entity_linking_ray/oracles.py), and the SQL below
    # points DuckDB at those files — the driver's row/schema/value-hash
    # compare then verifies the distributed dataflow end-to-end. The
    # driver runs at sf=0.01; both paths are deterministic pure functions
    # of the fixture spec.
    from snomed_ct_entity_linking_ray import fixtures, oracles

    sf_dir = "/root/testdata/sf0.01"
    odir = oracles.oracle_dir(sf_dir)
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    gold = _duck_path(f"{fdir}/gold_mentions.parquet")
    concepts = _duck_path(f"{fdir}/concepts.parquet")

    oracle_backed = {
        name: f"SELECT * FROM read_parquet('{odir}/{name}.parquet')"
        for name in (
            "media_inventory",
            "frame_samples",
            "simhash_buckets",
            "minhash_lsh_pairs",
            "cosine_topk_ivf",
            "encoder_topk",
            "dict_precision",
            "entity_link_mentions",
            "entity_link",
            "entity_link_eval_iou",
            "llm_ner",
            "approx_users",
            "bm25_topk",
            "winnow_dups",
            "cosine_topk_lsh",
            "dup_clusters",
            "quality_score",
            "kmeans_clusters",
            "phonetic_pairs",
            "mmr_topk",
            "char_entropy",
            "em_weights",
            "lm_perplexity",
            "pq_codes",
            "soft_tfidf_pairs",
            "decontaminate_bloom",
            "dedup_keep_best",
            "match_pagerank",
            "compression_ratio",
            "bpe_merges",
            "rrf_fusion",
            "ppjoin_pairs",
            "greedy_assignment",
            "kcore",
            "pprl_pairs",
            "stable_matching",
            "cosine_range",
            "knn_join",
            "cc_pivot",
            "bpe_tokens",
            "hard_negatives",
            "kmv_users",
            "ivf_pq_topk",
            "bfs_depth",
            "rake_phrases",
            "dim_truncation_recall",
            "kcenter_coreset",
            "progressive_er",
            "top_component",
            "int8_quant_audit",
            "ks_lengths",
        )
    }

    docs_tbl = _duck_path(f"{fdir}/docs.parquet")

    # exact integer revenue in cent-hundredths: price_cents × (100 −
    # disc_cents). Rounding the float product lands exactly on .5 for
    # 2-decimal prices/discounts, where numpy (half-even) and DuckDB
    # round() (half-away) disagree — so no float crosses this boundary.
    rev_cc = (
        "CAST(round(l_extendedprice*100,0) AS BIGINT)"
        " * (100 - CAST(round(l_discount*100,0) AS BIGINT))"
    )

    return {
        **oracle_backed,
        "latest_user_state": """
            SELECT user_id, event_type, ts, event_id, value FROM (
                SELECT user_id, event_type, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn
                FROM events) WHERE rn = 1
        """,
        "grouped_corr": """
            WITH m AS (
                SELECT l_returnflag,
                       CAST(l_quantity AS BIGINT) AS x,
                       CAST(round(l_discount*100, 0) AS BIGINT) AS y
                FROM lineitem),
            s AS (
                SELECT l_returnflag,
                       COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                       SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
                FROM m GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                   / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                          * CAST(n*syy - sy*sy AS DOUBLE)) AS corr_qd
            FROM s ORDER BY l_returnflag
        """,
        "twa_user_value": """
            WITH g AS (
                SELECT user_id,
                       CAST(round(value*100, 0) AS BIGINT) AS v,
                       (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                        - epoch_us(ts)) // 1000000 AS gap_s
                FROM events),
            a AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                       CAST(sum(gap_s) AS BIGINT) AS span_s,
                       CAST(sum(v * gap_s) AS BIGINT) AS weighted_cents
                FROM g GROUP BY user_id)
            SELECT user_id, n_events, span_s, weighted_cents,
                   CAST(weighted_cents AS DOUBLE) / span_s AS twa_cents
            FROM a WHERE span_s > 0
        """,
        "profile_columns": """
            SELECT 'o_orderkey' AS col, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_v,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_v
            FROM orders
            UNION ALL
            SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_custkey) AS BIGINT),
                   CAST(count(DISTINCT o_custkey) AS BIGINT),
                   CAST(min(o_custkey) AS VARCHAR),
                   CAST(max(o_custkey) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_orderstatus) AS BIGINT),
                   CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                   CAST(min(o_orderstatus) AS VARCHAR),
                   CAST(max(o_orderstatus) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_orderpriority) AS BIGINT),
                   CAST(count(DISTINCT o_orderpriority) AS BIGINT),
                   CAST(min(o_orderpriority) AS VARCHAR),
                   CAST(max(o_orderpriority) AS VARCHAR)
            FROM orders
        """,
        "uncertain_pairs": """
            WITH p AS (
                SELECT a.p_partkey AS p_partkey_a, b.p_partkey AS p_partkey_b,
                       CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name)
                                  * 20) AS BIGINT) AS jw_bin
                FROM part a JOIN part b
                  ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                 AND a.p_brand = b.p_brand
                 AND a.p_partkey < b.p_partkey)
            SELECT p_partkey_a, p_partkey_b, jw_bin,
                   CAST(abs(jw_bin - 17) AS BIGINT) AS uncertainty
            FROM p
            ORDER BY uncertainty, p_partkey_a, p_partkey_b
            LIMIT 50
        """,
        "fully_returned_orders": """
            SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                HAVING count(*) = count(*) FILTER (WHERE l_returnflag = 'R'))
            GROUP BY 1
        """,
        "pareto_orders": """
            WITH o AS (SELECT o_orderkey,
                              CAST(round(o_totalprice*100,0) AS BIGINT) AS p,
                              o_orderdate AS d FROM orders),
            g AS (SELECT d, max(p) AS pmax FROM o GROUP BY d),
            c AS (SELECT d, pmax,
                         max(pmax) OVER (ORDER BY d
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prevmax
                  FROM g)
            SELECT o.o_orderkey, o.d AS o_orderdate, o.p AS price_cents
            FROM o JOIN c ON o.d = c.d
            WHERE o.p = c.pmax AND (c.prevmax IS NULL OR o.p > c.prevmax)
        """,
        "media_clusters": f"""
            WITH RECURSIVE m AS (
                SELECT DISTINCT substring(s.media_ref, 9, 2) AS bucket, doc_id
                FROM read_parquet('{docs_tbl}'), unnest(spans) AS u(s)
                WHERE s.kind = 'media'),
            e AS (SELECT a.doc_id AS na, b.doc_id AS nb
                  FROM m a JOIN m b
                    ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            docs AS (SELECT DISTINCT doc_id FROM m),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM docs
                UNION
                SELECT r.src, u.nb FROM reach r JOIN und u ON r.dst = u.na)
            SELECT src AS doc_id, min(dst) AS cluster_rep
            FROM reach GROUP BY src
        """,
        "crosslink_best": """
            WITH a AS (SELECT DISTINCT p_name FROM part WHERE p_partkey % 2 = 0),
            b AS (SELECT DISTINCT p_name FROM part WHERE p_partkey % 2 = 1),
            c AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                         jaro_winkler_similarity(a.p_name, b.p_name) AS jw
                  FROM a JOIN b
                    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8)
            SELECT name_a, name_b AS best_b,
                   CAST(floor(jw * 1000000) AS BIGINT) AS jw_ubin
            FROM (SELECT *, row_number() OVER (PARTITION BY name_a
                                               ORDER BY jw DESC, name_b) AS rn
                  FROM c)
            WHERE rn = 1
        """,
        "fk_audit": """
            SELECT 'lineitem' AS child_table, 'l_orderkey' AS fk_col,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) FILTER (WHERE l_orderkey NOT IN
                        (SELECT o_orderkey FROM orders)) AS BIGINT)
                       AS n_orphans
            FROM lineitem
            UNION ALL
            SELECT 'lineitem', 'l_partkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE l_partkey NOT IN
                        (SELECT p_partkey FROM part)) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem', 'l_suppkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE l_suppkey NOT IN
                        (SELECT s_suppkey FROM supplier)) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'orders', 'o_custkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE o_custkey NOT IN
                        (SELECT c_custkey FROM customer)) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'customer', 'c_nationkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE c_nationkey NOT IN
                        (SELECT n_nationkey FROM nation)) AS BIGINT)
            FROM customer
        """,
        "table_checksum": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(SUM(((l_orderkey % 1000003) * 2654435761
                             + CAST(l_linenumber AS BIGINT) * 97
                             + CAST(l_quantity AS BIGINT) * 131)
                            % 1000000007)
                        % 1000000007 AS BIGINT) AS checksum
            FROM lineitem
        """,
        "weighted_sample": """
            WITH w AS (SELECT doc_id, 1 + (n_chars % 13) AS w
                       FROM documents),
            t AS (SELECT doc_id, w,
                         MAX((((doc_id*16 + j) % 1000003) * 2654435761)
                             % 1000000007) AS rk
                  FROM w, generate_series(0, 12) AS g(j)
                  WHERE j < w GROUP BY 1, 2)
            SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(rk AS BIGINT) AS rk
            FROM t ORDER BY rk DESC, doc_id LIMIT 100
        """,
        "event_gaps": """
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) AS gap_us
            FROM (SELECT event_id, user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_ts
                  FROM events)
            WHERE prev_ts IS NOT NULL
        """,
        "shipping_priority": f"""
            SELECT l_orderkey, o_orderdate, revenue_ccents FROM (
                SELECT l_orderkey, o_orderdate,
                       CAST(SUM({rev_cc}) AS BIGINT) AS revenue_ccents
                FROM customer JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
                  AND l_shipdate > TIMESTAMP '1998-01-01'
                GROUP BY 1, 2)
            ORDER BY revenue_ccents DESC, o_orderdate, l_orderkey LIMIT 10
        """,
        "local_supplier_volume": f"""
            SELECT n_name, CAST(SUM({rev_cc}) AS BIGINT) AS revenue_ccents
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        "redact_terms": r"""
            SELECT doc_id,
                   regexp_replace(text, '\b(spark|merge)\b', '<RED>', 'g')
                       AS clean_text,
                   CAST(len(regexp_extract_all(text, '\b(spark|merge)\b'))
                        AS BIGINT) AS n_redacted
            FROM documents
        """,
        "quality_filter": """
            WITH s AS (SELECT doc_id,
                CAST(length(text) - length(replace(text,' ','')) + 1 AS BIGINT)
                    AS n_words,
                CAST(length(replace(text,' ','')) AS BIGINT) AS total_word_chars,
                CAST(len(list_filter(string_split(text,' '),
                     w -> list_contains(['the','a','fast','slow'], w)))
                     AS BIGINT) AS n_stopwords
              FROM documents)
            SELECT doc_id, n_words, n_stopwords, total_word_chars FROM s
            WHERE n_words BETWEEN 20 AND 80 AND n_stopwords*10 >= n_words
              AND total_word_chars*10 <= n_words*48
        """,
        "bigram_lift": """
            WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
            uc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
                   FROM (SELECT unnest(ws) AS word FROM w) GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM uc),
            g AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM w),
            bg AS (SELECT ws[CAST(i AS BIGINT)] AS w1,
                          ws[CAST(i+1 AS BIGINT)] AS w2 FROM g),
            bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
                   FROM bg GROUP BY 1, 2)
            SELECT w1, w2, n_ab, n_a, n_b, lift FROM (
                SELECT bc.w1, bc.w2, bc.n_ab, a.n AS n_a, b.n AS n_b,
                       CAST(bc.n_ab AS DOUBLE) * (SELECT t FROM tot)
                           / (CAST(a.n AS DOUBLE) * b.n) AS lift
                FROM bc JOIN uc a ON bc.w1 = a.word JOIN uc b ON bc.w2 = b.word)
            ORDER BY lift DESC, w1, w2 LIMIT 20
        """,
        "fuzzy_name_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b
            FROM names a JOIN names b
              ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
             AND abs(length(a.p_name) - length(b.p_name)) <= 3
             AND a.p_name < b.p_name
            WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8
        """,
        "match_patterns": """
            SELECT agree_name, agree_type, agree_size,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM (
                SELECT CAST(CASE WHEN jaro_winkler_similarity(
                                a.p_name, b.p_name) >= 0.85
                            THEN 1 ELSE 0 END AS BIGINT) AS agree_name,
                       CAST(CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0
                            END AS BIGINT) AS agree_type,
                       CAST(CASE WHEN abs(a.p_size - b.p_size) <= 2
                            THEN 1 ELSE 0 END AS BIGINT) AS agree_size
                FROM part a JOIN part b
                  ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                 AND a.p_brand = b.p_brand
                 AND a.p_partkey < b.p_partkey)
            GROUP BY 1, 2, 3
        """,
        "golden_user_profile": """
            WITH c AS (SELECT user_id, event_type, count(*) AS n
                       FROM events GROUP BY 1, 2),
            top AS (SELECT user_id, event_type AS top_type FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY n DESC, event_type) AS rn
                FROM c) WHERE rn = 1),
            agg AS (SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
                           CAST(count(*) AS BIGINT) AS n_events,
                           CAST(SUM(CAST(round(value*100, 0) AS BIGINT))
                                AS BIGINT) AS value_cents
                    FROM events GROUP BY 1)
            SELECT agg.user_id, first_ts, last_ts, n_events, value_cents,
                   top_type
            FROM agg JOIN top USING (user_id)
        """,
        "match_weights": """
            WITH p AS (
                SELECT CASE WHEN jaro_winkler_similarity(a.p_name, b.p_name)
                                 >= 0.85 THEN 1 ELSE 0 END AS an,
                       CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS mt,
                       CASE WHEN abs(a.p_size - b.p_size) <= 2 THEN 1 ELSE 0
                            END AS asz
                FROM part a JOIN part b
                  ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                 AND a.p_brand = b.p_brand
                 AND a.p_partkey < b.p_partkey)
            SELECT 'name' AS field,
                   CAST(SUM(mt) AS BIGINT) AS n_match,
                   CAST(SUM(mt*an) AS BIGINT) AS n_match_agree,
                   CAST(SUM(1-mt) AS BIGINT) AS n_nonmatch,
                   CAST(SUM((1-mt)*an) AS BIGINT) AS n_nonmatch_agree,
                   CAST(SUM(mt*an) AS DOUBLE) / CAST(SUM(mt) AS DOUBLE) AS m,
                   CAST(SUM((1-mt)*an) AS DOUBLE) / CAST(SUM(1-mt) AS DOUBLE)
                       AS u
            FROM p
            UNION ALL
            SELECT 'size',
                   CAST(SUM(mt) AS BIGINT),
                   CAST(SUM(mt*asz) AS BIGINT),
                   CAST(SUM(1-mt) AS BIGINT),
                   CAST(SUM((1-mt)*asz) AS BIGINT),
                   CAST(SUM(mt*asz) AS DOUBLE) / CAST(SUM(mt) AS DOUBLE),
                   CAST(SUM((1-mt)*asz) AS DOUBLE) / CAST(SUM(1-mt) AS DOUBLE)
            FROM p
        """,
        "blocking_metrics": """
            WITH t AS (SELECT substr(p_name,1,1) AS ch, p_brand, p_type
                       FROM part),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
            b AS (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT) AS bp
                  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                        GROUP BY ch, p_brand)),
            tr AS (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT) AS tp
                   FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                         GROUP BY p_type)),
            tb AS (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT) AS tbp
                   FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                         GROUP BY ch, p_brand, p_type))
            SELECT CAST(n*(n-1)//2 AS BIGINT) AS total_pairs,
                   bp AS blocked_pairs,
                   tp AS true_pairs,
                   tbp AS true_blocked_pairs,
                   1.0 - CAST(bp AS DOUBLE) / CAST(n*(n-1)//2 AS DOUBLE)
                       AS reduction_ratio,
                   CAST(tbp AS DOUBLE) / CAST(tp AS DOUBLE)
                       AS pairs_completeness
            FROM tot, b, tr, tb
        """,
        "cube_summary": """
            SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
                   coalesce(l_linestatus, '(all)') AS l_linestatus,
                   CAST(SUM(CAST(round(l_quantity*100, 0) AS BIGINT))
                        AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(round(l_discount*100, 0) AS BIGINT))
                        AS BIGINT) AS sum_disc_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "exact_quantiles": """
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(quantile_disc(CAST(round(l_extendedprice*100, 0)
                                           AS BIGINT), 0.5) AS BIGINT)
                       AS p50_cents,
                   CAST(quantile_disc(CAST(round(l_extendedprice*100, 0)
                                           AS BIGINT), 0.9) AS BIGINT)
                       AS p90_cents,
                   CAST(quantile_disc(CAST(round(l_extendedprice*100, 0)
                                           AS BIGINT), 0.99) AS BIGINT)
                       AS p99_cents
            FROM lineitem GROUP BY 1
        """,
        "shipmode_priority": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "bcubed_metrics": """
            WITH cell AS (
              SELECT string_split(p_name, ' ')[1] AS pred, p_type AS gold,
                     count(*) AS n
              FROM part GROUP BY 1, 2)
            SELECT 'pred' AS side, pred AS key,
                   CAST(SUM(n) AS BIGINT) AS n_records,
                   CAST(SUM(n*n) AS BIGINT) AS sum_sq,
                   CAST(SUM(n*n) AS DOUBLE)
                       / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
                       AS score
            FROM cell GROUP BY 2
            UNION ALL
            SELECT 'gold' AS side, gold AS key,
                   CAST(SUM(n) AS BIGINT) AS n_records,
                   CAST(SUM(n*n) AS BIGINT) AS sum_sq,
                   CAST(SUM(n*n) AS DOUBLE)
                       / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
                       AS score
            FROM cell GROUP BY 2
        """,
        "token_diversity": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
              FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE CAST(len(list_distinct(toks)) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) END AS ttr
            FROM t
        """,
        "length_band_filter": """
            WITH h AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
                              quantile_disc(n_chars, 0.95) AS hi
                       FROM documents)
            SELECT d.doc_id, d.n_chars
            FROM documents d, h
            WHERE d.n_chars >= h.lo AND d.n_chars <= h.hi
        """,
        "length_cdf": """
            SELECT doc_id, n_chars,
                   cume_dist() OVER (ORDER BY n_chars) AS cdf
            FROM documents
        """,
        "user_modal_event": """
            WITH c AS (
              SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY 1, 2),
            r AS (
              SELECT user_id, event_type, n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type) AS rn
              FROM c)
            SELECT user_id, event_type AS mode_event,
                   CAST(n AS BIGINT) AS n_events
            FROM r WHERE rn = 1
        """,
        "canonical_names": """
            WITH c AS (
              SELECT p_name,
                     array_to_string(
                       list_sort(list_filter(
                         regexp_split_to_array(lower(p_name), '[^a-z0-9]+'),
                         x -> x <> '')), ' ') AS canon
              FROM part)
            SELECT canon,
                   CAST(count(DISTINCT p_name) AS BIGINT) AS n_names,
                   CAST(count(*) AS BIGINT) AS n_records
            FROM c GROUP BY 1
        """,
        "ari_metric": """
            WITH base AS (
                SELECT split_part(p_name, ' ', 1) AS pred, p_type AS gold
                FROM part),
            cell AS (SELECT pred, gold, COUNT(*) AS n FROM base GROUP BY 1, 2),
            prow AS (SELECT pred, SUM(n) AS n FROM cell GROUP BY 1),
            grow AS (SELECT gold, SUM(n) AS n FROM cell GROUP BY 1),
            s AS (SELECT
                (SELECT CAST(SUM(n) AS BIGINT) FROM cell) AS n_records,
                (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM cell)
                    AS tp_pairs,
                (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM prow)
                    AS pred_pairs,
                (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM grow)
                    AS gold_pairs),
            e AS (SELECT *,
                CAST(pred_pairs AS DOUBLE) * CAST(gold_pairs AS DOUBLE)
                    / CAST(n_records * (n_records - 1) // 2 AS DOUBLE)
                    AS expected_tp
                FROM s)
            SELECT n_records, tp_pairs, pred_pairs, gold_pairs, expected_tp,
                   (CAST(tp_pairs AS DOUBLE) - expected_tp)
                     / (CAST(pred_pairs + gold_pairs AS DOUBLE) / 2.0
                        - expected_tp) AS ari
            FROM e
        """,
        "edit_neighbors": """
            WITH d AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM d a, d b
            WHERE a.p_name < b.p_name
              AND levenshtein(a.p_name, b.p_name) <= 1
        """,
        "hamming_neighbors": """
            WITH d AS (SELECT DISTINCT p_name FROM part),
            m AS (SELECT p_name,
                    bit_or(1::BIGINT <<
                      (strpos('abcdefghijklmnopqrstuvwxyz0123456789', c) - 1))
                      AS mask
                  FROM (SELECT p_name,
                          unnest(regexp_extract_all(lower(p_name), '[a-z0-9]'))
                            AS c
                        FROM d)
                  GROUP BY 1)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(bit_count(xor(a.mask, b.mask)) AS BIGINT) AS dist
            FROM m a, m b
            WHERE a.p_name < b.p_name
              AND bit_count(xor(a.mask, b.mask)) <= 2
        """,
        "oov_rate": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
            nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, COUNT(*) AS n FROM nz GROUP BY 1
                ORDER BY n DESC, tok LIMIT 16)),
            per AS (
              SELECT t.doc_id,
                     COUNT(*) AS n_tokens,
                     CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_oov
              FROM nz t LEFT JOIN vocab v USING (tok)
              GROUP BY 1)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_oov,
                   CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
            FROM per
        """,
        "grouped_variance": """
            WITH m AS (
              SELECT l_returnflag,
                     COUNT(*) AS n,
                     SUM(CAST(l_quantity AS BIGINT)) AS s,
                     SUM(CAST(l_quantity AS BIGINT)
                         * CAST(l_quantity AS BIGINT)) AS ss
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(s AS BIGINT) AS sum_qty,
                   CAST(n * ss - s * s AS DOUBLE)
                     / CAST(n * (n - 1) AS DOUBLE) AS var_qty
            FROM m
        """,
        "knn_classify": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id < 16),
            c AS (SELECT vec_id, embedding, label FROM embeddings
                  WHERE vec_id >= 16),
            r AS (SELECT q.vec_id AS query_id, c.label,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.embedding,
                                                      c.embedding) DESC,
                               c.vec_id) AS rank
                  FROM q, c),
            k AS (SELECT query_id, label FROM r WHERE rank <= 5),
            v AS (SELECT query_id, label, COUNT(*) AS n FROM k GROUP BY 1, 2),
            w AS (SELECT query_id, label, n,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY n DESC, label) AS rn
                  FROM v)
            SELECT query_id, CAST(label AS BIGINT) AS pred_label,
                   CAST(n AS BIGINT) AS n_votes
            FROM w WHERE rn = 1
        """,
        "prefix_dups": """
            SELECT a.doc_id AS prefix_doc, b.doc_id AS super_doc,
                   a.n_chars AS prefix_len
            FROM documents a, documents b
            WHERE a.doc_id <> b.doc_id
              AND a.n_chars < b.n_chars
              AND a.text = substr(b.text, 1, CAST(a.n_chars AS INT))
        """,
        "user_event_path": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        """,
        "priority_revenue_share": """
            WITH g AS (
              SELECT o_orderpriority,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS revenue_ccents
              FROM orders GROUP BY 1)
            SELECT o_orderpriority,
                   CAST(revenue_ccents AS BIGINT) AS revenue_ccents,
                   CAST(revenue_ccents AS DOUBLE)
                     / CAST((SELECT SUM(revenue_ccents) FROM g) AS DOUBLE)
                     AS share
            FROM g
        """,
        "freq_of_freqs": """
            WITH toks AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            c AS (SELECT tok, COUNT(*) AS n FROM toks WHERE tok <> ''
                  GROUP BY 1)
            SELECT n AS freq, CAST(COUNT(*) AS BIGINT) AS n_types
            FROM c GROUP BY 1
        """,
        "multipass_pairs": """
            WITH d AS (SELECT DISTINCT p_name FROM part),
            s AS (
              SELECT a.p_name AS name_a, b.p_name AS name_b, 1 AS bit
              FROM d a, d b WHERE a.p_name < b.p_name
                AND substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
              UNION ALL
              SELECT a.p_name, b.p_name, 2
              FROM d a, d b WHERE a.p_name < b.p_name
                AND length(a.p_name) = length(b.p_name)
              UNION ALL
              SELECT a.p_name, b.p_name, 4
              FROM d a, d b WHERE a.p_name < b.p_name
                AND substr(a.p_name, -1, 1) = substr(b.p_name, -1, 1))
            SELECT name_a, name_b, CAST(SUM(bit) AS BIGINT) AS schemes,
                   CAST(COUNT(*) AS BIGINT) AS n_schemes
            FROM s GROUP BY 1, 2
        """,
        "substring_contamination": """
            WITH ev AS (
              SELECT array_to_string(
                       (string_split(text, ' '))[1:3], ' ') AS frag
              FROM documents WHERE doc_id % 97 = 0),
            f AS (SELECT DISTINCT frag FROM ev WHERE frag <> '')
            SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_frags
            FROM documents d JOIN f ON contains(d.text, f.frag)
            WHERE d.doc_id % 97 <> 0
            GROUP BY 1
        """,
        "event_transitions": """
            WITH o AS (
              SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                       AS next_type
              FROM events)
            SELECT event_type AS from_type, next_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
        """,
        "nation_profit": f"""
            SELECT n_name, o_year,
                   CAST(SUM({rev_cc}) AS BIGINT) AS profit_ccents
            FROM (SELECT n_name,
                         CAST(year(o_orderdate) AS BIGINT) AS o_year,
                         l_extendedprice, l_discount
                  FROM lineitem
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN part ON l_partkey = p_partkey
                  WHERE p_name LIKE '%bolt%')
            GROUP BY 1, 2
        """,
        "qualified_suppliers": """
            SELECT s_suppkey, s_name, total_qty_cents
            FROM supplier JOIN (
              SELECT l_suppkey AS s_suppkey,
                     CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT)
                         AS total_qty_cents
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE '%red%'
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY 1) USING (s_suppkey)
            WHERE total_qty_cents > 30000
        """,
        "brand_supplier_counts": """
            SELECT p_brand, p_type,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
            GROUP BY 1, 2
        """,
        "span_kind_signature": f"""
            SELECT array_to_string(list_transform(spans, s -> s.kind), ',')
                       AS sig,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM read_parquet('{docs_tbl}')
            GROUP BY 1
        """,
        "pair_triangles": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            e AS (
              SELECT a.p_name AS name_a, b.p_name AS name_b
              FROM names a JOIN names b
                ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
               AND abs(length(a.p_name) - length(b.p_name)) <= 3
               AND a.p_name < b.p_name
              WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8)
            SELECT e1.name_a, e1.name_b, e2.name_c
            FROM e e1
            JOIN (SELECT name_a AS mid, name_b AS name_c FROM e) e2
              ON e1.name_b = e2.mid
            JOIN e e3
              ON e3.name_a = e1.name_a AND e3.name_b = e2.name_c
        """,
        "value_histogram": """
            WITH v AS (SELECT CAST(round(value*100,0) AS BIGINT) AS c
                       FROM events),
            s AS (SELECT min(c) AS mn, max(c) AS mx FROM v),
            w AS (SELECT mn, GREATEST(1, (mx - mn + 20) // 20) AS width
                  FROM s)
            SELECT (c - mn) // width AS bin,
                   mn + ((c - mn) // width) * width AS lo_cents,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM v, w GROUP BY 1, 2
        """,
        "strip_media_remap": f"""
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id
                                           ORDER BY ord) - 1 AS BIGINT) AS k,
                   CAST(COALESCE(SUM(length(s.text)) OVER (
                       PARTITION BY doc_id ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS new_offset,
                   CAST(length(s.text) AS BIGINT) AS span_len
            FROM (SELECT doc_id, unnest(spans) AS s,
                         generate_subscripts(spans, 1) AS ord
                  FROM read_parquet('{docs_tbl}'))
            WHERE s.kind = 'text'
        """,
        "late_events": """
            WITH a AS (SELECT event_id, user_id, ts,
                              (CAST(event_id AS HUGEINT)
                               * 11400714819323198485)
                              % 18446744073709551616 AS ak
                       FROM events)
            SELECT event_id, user_id,
                   CAST(epoch_us(prior_max) - epoch_us(ts) AS BIGINT) AS lag_us
            FROM (SELECT event_id, user_id, ts,
                         max(ts) OVER (PARTITION BY user_id
                                       ORDER BY ak, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prior_max
                  FROM a)
            WHERE prior_max IS NOT NULL
              AND ts < prior_max - INTERVAL 1 HOUR
        """,
        "segment_runs": """
            WITH x AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(event_type) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id)
                          IS DISTINCT FROM event_type
                          THEN 1 ELSE 0 END AS is_start
              FROM events),
            y AS (SELECT user_id,
                         SUM(is_start) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS run_id
                  FROM x),
            r AS (SELECT user_id, run_id, count(*) AS run_len
                  FROM y GROUP BY 1, 2)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs,
                   CAST(max(run_len) AS BIGINT) AS max_run_len
            FROM r GROUP BY 1
        """,
        "dup_rate_by_source": """
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
                   CAST(count(*) - count(DISTINCT text) AS BIGINT)
                       AS n_dup_docs
            FROM documents GROUP BY 1, 2
        """,
        "qgram_overlap_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            g AS (SELECT DISTINCT p_name, substr(p_name, i, 4) AS gram
                  FROM names, generate_series(1, 256) AS t(i)
                  WHERE i <= length(p_name) - 3),
            ok AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 64)
            SELECT name_a, name_b, CAST(n AS BIGINT) AS n_shared FROM (
              SELECT a.p_name AS name_a, b.p_name AS name_b, count(*) AS n
              FROM g a JOIN g b ON a.gram = b.gram AND a.p_name < b.p_name
              JOIN ok ON ok.gram = a.gram
              GROUP BY 1, 2)
            WHERE n >= 3
        """,
        "audience_overlap": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_common_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "media_context": f"""
            WITH x AS (SELECT doc_id, s.kind AS kind, s.text AS txt,
                              s.media_ref AS media_ref, ord
                       FROM (SELECT doc_id, unnest(spans) AS s,
                                    generate_subscripts(spans, 1) AS ord
                             FROM read_parquet('{docs_tbl}'))),
            y AS (SELECT doc_id, kind, media_ref,
                         lag(kind) OVER w AS pk, lag(txt) OVER w AS pt,
                         lead(kind) OVER w AS nk, lead(txt) OVER w AS nt
                  FROM x WINDOW w AS (PARTITION BY doc_id ORDER BY ord))
            SELECT doc_id, media_ref,
                   CASE WHEN pk = 'text' THEN right(pt, 24) ELSE '' END
                       AS before_ctx,
                   CASE WHEN nk = 'text' THEN substr(nt, 1, 24) ELSE '' END
                       AS after_ctx
            FROM y WHERE kind = 'media'
        """,
        "value_outliers": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value*100,0) AS BIGINT) AS c
                       FROM events),
            st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                          CAST(SUM(c) AS HUGEINT) AS sv,
                          SUM(CAST(c AS HUGEINT) * c) AS svv
                   FROM v GROUP BY 1)
            SELECT event_id, v.event_type, c AS value_cents
            FROM v JOIN st ON v.event_type = st.event_type
            WHERE (n*c - sv)*(n*c - sv) > 9*(n*svv - sv*sv)
        """,
        "match_degree_hist": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            e AS (
              SELECT a.p_name AS name_a, b.p_name AS name_b
              FROM names a JOIN names b
                ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
               AND abs(length(a.p_name) - length(b.p_name)) <= 3
               AND a.p_name < b.p_name
              WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            nodes AS (SELECT name_a AS node FROM e
                      UNION ALL SELECT name_b FROM e),
            deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY 1)
            SELECT CAST(degree AS BIGINT) AS degree,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY 1
        """,
        "ann_recall": f"""
            WITH e AS (
              SELECT query_id, match_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       row_number() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                q.embedding, c.embedding) DESC,
                                     c.vec_id) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 16 AND c.vec_id >= 16
              ) WHERE rank <= 5),
            a AS (SELECT query_id, match_id
                  FROM read_parquet('{odir}/cosine_topk_ivf.parquet'))
            SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits,
                   CAST(5 AS BIGINT) AS k
            FROM e JOIN a ON e.query_id = a.query_id
                         AND e.match_id = a.match_id
            GROUP BY 1
        """,
        "user_first_last": """
            WITH o AS (SELECT user_id, event_type,
                              CAST(round(value*100,0) AS BIGINT) AS c,
                              row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rf,
                              row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rl
                       FROM events)
            SELECT f.user_id, f.event_type AS first_type,
                   l.event_type AS last_type,
                   CAST(l.c - f.c AS BIGINT) AS value_delta_cents
            FROM (SELECT * FROM o WHERE rf = 1) f
            JOIN (SELECT * FROM o WHERE rl = 1) l USING (user_id)
        """,
        "top2_gap": """
            WITH v AS (SELECT event_type,
                              CAST(round(value*100,0) AS BIGINT) AS c
                       FROM events),
            r AS (SELECT event_type, c, row_number() OVER (
                      PARTITION BY event_type ORDER BY c DESC) AS rk
                  FROM v)
            SELECT event_type,
                   MAX(CASE WHEN rk = 1 THEN c END) AS top_cents,
                   CAST(MAX(CASE WHEN rk = 1 THEN c END)
                        - COALESCE(MAX(CASE WHEN rk = 2 THEN c END),
                                   MAX(CASE WHEN rk = 1 THEN c END))
                        AS BIGINT) AS gap_cents
            FROM r WHERE rk <= 2 GROUP BY 1
        """,
        "transitive_pairs": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb
                  FROM names a JOIN names b
                    ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            reach(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, u.nb FROM reach r JOIN und u ON r.dst = u.na
            ),
            clus AS (SELECT src AS p_name, min(dst) AS rep
                     FROM reach GROUP BY src)
            SELECT a.p_name AS name_a, b.p_name AS name_b
            FROM clus a JOIN clus b
              ON a.rep = b.rep AND a.p_name < b.p_name
            LEFT JOIN e ON e.na = a.p_name AND e.nb = b.p_name
            WHERE e.na IS NULL
        """,
        "order_latency": """
            SELECT o_orderkey,
                   CAST((epoch_us(last_ship) - epoch_us(o_orderdate))
                        // 86400000000 AS BIGINT) AS fill_days
            FROM orders JOIN (
              SELECT l_orderkey, max(l_shipdate) AS last_ship
              FROM lineitem GROUP BY 1) ON o_orderkey = l_orderkey
        """,
        "top_words_per_lang": """
            WITH c AS (
              SELECT lang, word, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                    FROM documents)
              WHERE word <> '' GROUP BY 1, 2),
            r AS (SELECT lang, word, n, CAST(row_number() OVER (
                      PARTITION BY lang ORDER BY n DESC, word) AS BIGINT)
                      AS rank
                  FROM c)
            SELECT lang, word, n, rank FROM r WHERE rank <= 5
        """,
        "span_transitions": f"""
            SELECT kind_from, kind_to, CAST(count(*) AS BIGINT)
                       AS n_transitions
            FROM (SELECT doc_id, kind,
                         lag(kind) OVER (PARTITION BY doc_id
                                         ORDER BY ord) AS kind_from,
                         kind AS kind_to
                  FROM (SELECT doc_id, unnest(spans).kind AS kind,
                               generate_subscripts(spans, 1) AS ord
                        FROM read_parquet('{docs_tbl}')))
            WHERE kind_from IS NOT NULL
            GROUP BY 1, 2
        """,
        "simhash_pairs": f"""
            WITH s AS (SELECT doc_id, simhash
                       FROM read_parquet('{odir}/simhash_buckets.parquet')),
            sb AS (SELECT doc_id, simhash, bucket
                   FROM read_parquet('{odir}/simhash_buckets.parquet'))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM sb a JOIN sb b
              ON a.bucket = b.bucket AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "hourly_delta": """
            WITH h AS (SELECT date_trunc('hour', ts) AS hour,
                              CAST(SUM(CAST(round(value*100,0) AS BIGINT))
                                   AS BIGINT) AS sum_cents
                       FROM events GROUP BY 1)
            SELECT hour, sum_cents, CAST(d AS BIGINT) AS delta_cents
            FROM (SELECT hour, sum_cents,
                         sum_cents - lag(sum_cents) OVER (ORDER BY hour) AS d
                  FROM h)
            WHERE d IS NOT NULL
        """,
        "vocab_growth": """
            WITH w AS (SELECT word, min(doc_id) AS first_doc
                       FROM (SELECT doc_id,
                                    unnest(string_split(text, ' ')) AS word
                             FROM documents)
                       WHERE word <> '' GROUP BY 1),
            h AS (SELECT first_doc, count(*) AS n_new FROM w GROUP BY 1)
            SELECT CAST(first_doc AS BIGINT) AS first_doc,
                   CAST(SUM(n_new) OVER (ORDER BY first_doc) AS BIGINT)
                       AS vocab_size
            FROM h
        """,
        "hourly_distinct_users": """
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "next_event_after_order": """
            SELECT o.o_orderkey, MIN(e.ts) AS next_event_ts
            FROM orders o JOIN events e
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            GROUP BY 1
        """,
        "top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS s_suppkey,
                     CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                         * 100, 0) AS BIGINT)) AS BIGINT)
                         AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate < TIMESTAMP '1995-04-01'
              GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM supplier s JOIN rev r USING (s_suppkey)
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "lone_return_supplier": """
            WITH ls AS (
              SELECT l_orderkey, l_suppkey,
                     max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                         AS ret
              FROM lineitem GROUP BY 1, 2),
            ag AS (
              SELECT l_orderkey, count(*) AS n_supp, sum(ret) AS n_ret
              FROM ls GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM ls JOIN ag USING (l_orderkey)
            JOIN supplier s ON s.s_suppkey = ls.l_suppkey
            WHERE ls.ret = 1 AND ag.n_supp >= 2 AND ag.n_ret = 1
            GROUP BY 1, 2
        """,
        "monge_elkan_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            toks AS (
              SELECT p_name,
                     unnest(string_split(p_name, ' ')) AS tok,
                     unnest(range(len(string_split(p_name, ' ')))) AS i
              FROM names),
            pairs AS (
              SELECT a.p_name AS name_a, b.p_name AS name_b
              FROM names a JOIN names b ON a.p_name < b.p_name),
            ab AS (
              SELECT name_a, name_b, CAST(sum(best) AS BIGINT)
                         AS me_ab_micro
              FROM (
                SELECT p.name_a, p.name_b, ta.i,
                       max(CAST(round(jaro_winkler_similarity(ta.tok, tb.tok)
                                      * 1000000, 0) AS BIGINT)) AS best
                FROM pairs p
                JOIN toks ta ON ta.p_name = p.name_a
                JOIN toks tb ON tb.p_name = p.name_b
                GROUP BY 1, 2, 3) q
              GROUP BY 1, 2),
            ba AS (
              SELECT name_a, name_b, CAST(sum(best) AS BIGINT)
                         AS me_ba_micro
              FROM (
                SELECT p.name_a, p.name_b, tb.i,
                       max(CAST(round(jaro_winkler_similarity(tb.tok, ta.tok)
                                      * 1000000, 0) AS BIGINT)) AS best
                FROM pairs p
                JOIN toks ta ON ta.p_name = p.name_a
                JOIN toks tb ON tb.p_name = p.name_b
                GROUP BY 1, 2, 3) q
              GROUP BY 1, 2)
            SELECT p.name_a, p.name_b, ab.me_ab_micro, ba.me_ba_micro,
                   len(string_split(p.name_a, ' ')) AS n_tok_a,
                   len(string_split(p.name_b, ' ')) AS n_tok_b
            FROM pairs p JOIN ab USING (name_a, name_b)
            JOIN ba USING (name_a, name_b)
        """,
        "small_qty_revenue": """
            WITH a AS (SELECT l_partkey,
                              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                                  AS sq,
                              CAST(count(*) AS BIGINT) AS nq
                       FROM lineitem GROUP BY l_partkey)
            SELECT CAST(COALESCE(SUM(CAST(round(l.l_extendedprice*100, 0)
                                          AS BIGINT)), 0) AS BIGINT)
                       AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem l JOIN a USING (l_partkey)
            WHERE CAST(l.l_quantity AS DOUBLE)
                  < 0.2 * (CAST(sq AS DOUBLE) / CAST(nq AS DOUBLE))
        """,
        "market_share": """
            WITH cust_r AS (SELECT c_custkey FROM customer
                            JOIN nation ON c_nationkey = n_nationkey
                            JOIN region ON n_regionkey = r_regionkey
                            WHERE r_name = 'ASIA'),
            j AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                         CAST(round(l_extendedprice*100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount*100, 0) AS BIGINT))
                             AS rev_cc,
                         s_nationkey
                  FROM lineitem
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN cust_r ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey),
            nk AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')
            SELECT o_year,
                   CAST(SUM(CASE WHEN s_nationkey IN
                                 (SELECT n_nationkey FROM nk)
                            THEN rev_cc ELSE 0 END) AS BIGINT)
                       AS nation_ccents,
                   CAST(SUM(rev_cc) AS BIGINT) AS total_ccents,
                   CAST(SUM(CASE WHEN s_nationkey IN
                                 (SELECT n_nationkey FROM nk)
                            THEN rev_cc ELSE 0 END) AS DOUBLE)
                       / CAST(SUM(rev_cc) AS DOUBLE) AS mkt_share
            FROM j GROUP BY o_year
        """,
        "match_roc": """
            WITH p AS (
                SELECT CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name)
                                  * 20) AS BIGINT) AS bin,
                       CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS mt
                FROM part a JOIN part b
                  ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                 AND a.p_brand = b.p_brand
                 AND a.p_partkey < b.p_partkey),
            g AS (SELECT bin, CAST(SUM(mt) AS BIGINT) AS nm,
                         CAST(SUM(1-mt) AS BIGINT) AS nn
                  FROM p GROUP BY bin),
            tot AS (SELECT CAST(SUM(mt) AS BIGINT) AS total_match FROM p),
            cum AS (SELECT t.b,
                           CAST(COALESCE((SELECT SUM(nm) FROM g
                                          WHERE g.bin >= t.b), 0) AS BIGINT)
                               AS tp,
                           CAST(COALESCE((SELECT SUM(nn) FROM g
                                          WHERE g.bin >= t.b), 0) AS BIGINT)
                               AS fp
                    FROM generate_series(0, 20) AS t(b))
            SELECT CAST(b AS DOUBLE) / CAST(20 AS DOUBLE) AS threshold,
                   tp, fp, total_match - tp AS fn,
                   CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS prec,
                   CAST(tp AS DOUBLE) / CAST(total_match AS DOUBLE) AS rec
            FROM cum, tot
            WHERE tp + fp > 0
        """,
        "metablocking_pairs": """
            SELECT pk_a, pk_b, n_shared FROM (
                SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
                       CAST((CASE WHEN substr(a.p_name,1,1)
                                       = substr(b.p_name,1,1)
                             THEN 1 ELSE 0 END)
                          + (CASE WHEN a.p_size = b.p_size
                             THEN 1 ELSE 0 END)
                          + (CASE WHEN a.p_type = b.p_type
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
                FROM part a JOIN part b ON a.p_partkey < b.p_partkey)
            WHERE n_shared >= 2
        """,
        "name_clusters": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb
                  FROM names a JOIN names b
                    ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            reach(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, u.nb FROM reach r JOIN und u ON r.dst = u.na
            )
            SELECT src AS p_name, min(dst) AS cluster_rep
            FROM reach GROUP BY src
        """,
        "sorted_neighborhood_pairs": """
            WITH r AS (SELECT c_custkey,
                              row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rk
                       FROM customer)
            SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                   CAST(b.rk - a.rk AS BIGINT) AS rank_gap
            FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 3
        """,
        "customer_order_distribution": """
            SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers FROM (
                SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
                FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey)
            GROUP BY n_orders
        """,
        "sliding_activity": """
            WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
                       FROM events GROUP BY 1)
            SELECT hr, CAST(SUM(n) OVER (ORDER BY hr
                 RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_window
            FROM h
        """,
        "order_event_window": """
            SELECT o.o_orderkey,
                   CAST(count(e.user_id) AS BIGINT) AS n_events
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND e.ts > o.o_orderdate
             AND e.ts <= o.o_orderdate + INTERVAL 7 DAY
            GROUP BY o.o_orderkey
        """,
        "posting_lists": """
            WITH td AS (SELECT DISTINCT doc_id, w AS term FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents))
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM td GROUP BY term
        """,
        "funnel_conversion": """
            WITH f AS (SELECT user_id,
                              min(CASE WHEN event_type='view' THEN ts END) AS t1,
                              min(CASE WHEN event_type='click' THEN ts END) AS t2,
                              min(CASE WHEN event_type='purchase' THEN ts END) AS t3
                       FROM events GROUP BY user_id)
            SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
                   CAST(count(*) FILTER (WHERE t1 IS NOT NULL) AS BIGINT) AS n_users
            FROM f
            UNION ALL
            SELECT 2, 'click',
                   count(*) FILTER (WHERE t1 IS NOT NULL AND t2 > t1)
            FROM f
            UNION ALL
            SELECT 3, 'purchase',
                   count(*) FILTER (WHERE t1 IS NOT NULL AND t2 > t1 AND t3 > t2)
            FROM f
        """,
        "span_stats": f"""
            SELECT doc_id,
                   CAST(len(spans) AS BIGINT) AS n_spans,
                   CAST(len(list_filter(spans, s -> s.kind = 'text')) AS BIGINT)
                       AS n_text,
                   CAST(len(list_filter(spans, s -> s.kind = 'media')) AS BIGINT)
                       AS n_media,
                   CAST(coalesce(
                        list_sum(list_transform(spans, s -> length(s.text))), 0)
                        AS BIGINT) AS text_chars
            FROM read_parquet('{docs_tbl}')
        """,
        "media_bucket_pairs": f"""
            WITH m AS (
                SELECT DISTINCT substring(s.media_ref, 9, 2) AS bucket, doc_id
                FROM read_parquet('{docs_tbl}'), unnest(spans) AS u(s)
                WHERE s.kind = 'media')
            SELECT a.bucket, a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM m a JOIN m b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        """,
        "compose_pipeline": """
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                       AS n_tokens
            FROM documents
            WHERE length(text) - length(replace(text, ' ', '')) + 1 > 50
        """,
        "doc_freq": """
            SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            GROUP BY 1
        """,
        "len_quantiles": """
            SELECT CAST(0.25 AS DOUBLE) AS q,
                   CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS n_chars
            FROM documents
            UNION ALL SELECT CAST(0.5  AS DOUBLE), percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_chars) FROM documents
            UNION ALL SELECT CAST(0.75 AS DOUBLE), percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) FROM documents
            UNION ALL SELECT CAST(0.9  AS DOUBLE), percentile_disc(0.9)  WITHIN GROUP (ORDER BY n_chars) FROM documents
            UNION ALL SELECT CAST(0.99 AS DOUBLE), percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) FROM documents
        """,
        "sample_stratified": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE ((doc_id % 1000003) * 2654435761) % 1000000007 % 1000 <
                  CASE lang WHEN 'en' THEN 200 WHEN 'fr' THEN 500
                            WHEN 'es' THEN 500 WHEN 'de' THEN 800
                            WHEN 'zh' THEN 1000 ELSE 0 END
        """,
        "langid": """
            WITH s AS (
                SELECT doc_id,
                    len(list_filter(string_split(text,' '), x -> x IN ('the','fast')))   AS de_en,
                    len(list_filter(string_split(text,' '), x -> x IN ('table','part'))) AS c_fr,
                    len(list_filter(string_split(text,' '), x -> x IN ('data','row')))   AS c_es,
                    len(list_filter(string_split(text,' '), x -> x IN ('hash','merge'))) AS c_de,
                    len(list_filter(string_split(text,' '), x -> x IN ('spark','batch'))) AS c_zh
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN greatest(de_en, c_fr, c_es, c_de, c_zh) = 0 THEN 'und'
                        WHEN c_de  = greatest(de_en, c_fr, c_es, c_de, c_zh) THEN 'de'
                        WHEN de_en = greatest(de_en, c_fr, c_es, c_de, c_zh) THEN 'en'
                        WHEN c_es  = greatest(de_en, c_fr, c_es, c_de, c_zh) THEN 'es'
                        WHEN c_fr  = greatest(de_en, c_fr, c_es, c_de, c_zh) THEN 'fr'
                        ELSE 'zh' END AS lang_pred
            FROM s
        """,
        "dict_majority": f"""
            WITH norm AS (
                SELECT section,
                       trim(regexp_replace(lower(surface), '[^a-z0-9]+', ' ', 'g')) AS surface,
                       concept_id
                FROM read_parquet('{gold}')
            ), c AS (
                SELECT section, surface, concept_id, COUNT(*) AS n
                FROM norm GROUP BY 1, 2, 3
            )
            SELECT section, surface, concept_id, support FROM (
                SELECT section, surface, concept_id,
                       CAST(SUM(n) OVER (PARTITION BY section, surface) AS BIGINT) AS support,
                       row_number() OVER (PARTITION BY section, surface
                                          ORDER BY n DESC, concept_id) AS rn
                FROM c
            ) WHERE rn = 1
        """,
        "allowed_sections": f"""
            WITH hier AS (
                SELECT DISTINCT concept_id, hierarchy FROM read_parquet('{concepts}')
            ), pairs AS (
                SELECT DISTINCT h.hierarchy, g.section
                FROM read_parquet('{gold}') g JOIN hier h USING (concept_id)
            )
            SELECT hierarchy,
                   string_agg(section, '|' ORDER BY section) AS sections,
                   CAST(COUNT(*) AS BIGINT) AS n_sections
            FROM pairs GROUP BY hierarchy
        """,
        "filter_revenue": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1.0 - l_discount) AS revenue
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(round(l_quantity*100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(round(l_discount*100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY 1, 2
        """,
        "cohort_retention": """
            WITH f AS (SELECT user_id,
                         CAST(CAST(epoch(date_trunc('week', MIN(ts))) AS BIGINT)
                              // 86400 AS BIGINT) AS cohort_day
                       FROM events GROUP BY 1),
            e AS (SELECT DISTINCT user_id,
                         CAST(CAST(epoch(date_trunc('week', ts)) AS BIGINT)
                              // 86400 AS BIGINT) AS active_day
                  FROM events)
            SELECT f.cohort_day, e.active_day,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM f JOIN e USING (user_id) GROUP BY 1, 2
        """,
        "json_field_sum": """
            SELECT event_type,
                   CAST(COALESCE(
                        SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                        0) AS BIGINT) AS sum_k,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "grouped_median": """
            SELECT event_type,
                   CAST(percentile_disc(0.5) WITHIN GROUP (
                        ORDER BY CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
                       AS p50_value_cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "customer_event_summary": """
            SELECT c.c_custkey, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
            FROM customer c LEFT JOIN events e ON e.user_id = c.c_custkey
            GROUP BY 1
        """,
        "rollup_summary": """
            SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
                   coalesce(l_linestatus, '(all)') AS l_linestatus,
                   CAST(SUM(CAST(round(l_quantity*100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(round(l_discount*100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "orders_by_segment": """
            SELECT c_mktsegment,
                   CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "customers_per_region": """
            SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "top_orders": """
            SELECT o_orderkey, CAST(round(o_totalprice*100, 0) AS BIGINT) AS total_cents
            FROM orders ORDER BY total_cents DESC, o_orderkey DESC LIMIT 10
        """,
        "latest_order_before_event": """
            SELECT e.event_id, MAX(o.o_orderdate) AS last_order_ts
            FROM events e
            JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "hourly_user_activity": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "sessionize": """
            SELECT event_id, user_id,
                   CAST(SUM(CASE WHEN prev_ts IS NULL OR epoch(ts - prev_ts) > 1800
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                        AS BIGINT) AS session_id
            FROM (SELECT event_id, user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                  FROM events)
        """,
        "customers_without_events": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
        """,
        "parts_with_orders": """
            SELECT p_partkey, p_name FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        """,
        "first_event_per_user": """
            SELECT user_id, CAST(event_id AS BIGINT) AS first_event_id, ts AS first_ts
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "user_event_type_counts": """
            SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
            FROM events GROUP BY user_id
        """,
        "rolling_user_value": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(round(value*100, 0) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS rolling_value_cents
            FROM events
        """,
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, total_cents, rank FROM (
                SELECT c.c_mktsegment, o.o_orderkey,
                       CAST(round(o.o_totalprice*100, 0) AS BIGINT) AS total_cents,
                       CAST(row_number() OVER (
                            PARTITION BY c.c_mktsegment
                            ORDER BY round(o.o_totalprice*100, 0) DESC,
                                     o.o_orderkey DESC) AS BIGINT) AS rank
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ) WHERE rank <= 3
        """,
        "unigrams": """
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            GROUP BY 1
        """,
        "doc_stats": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(length(replace(text, ' ', '')) AS BIGINT) AS total_word_chars,
                   CAST(len(list_filter(string_split(text, ' '),
                            w -> list_contains(['the','a','fast','slow'], w))) AS BIGINT)
                       AS n_stopwords
            FROM documents
        """,
        "token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
                       AS n_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(lower(text)) AS fp FROM documents
        """,
        "llm_prompts": f"""
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            c AS (SELECT doc_id, ws,
                         unnest(range(0, CAST(ceil(len(ws)/{_PCHUNK}.0) AS BIGINT))) AS chunk_id
                  FROM d)
            SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                   '[INST] ' || '{_PSYS}' || chr(10) ||
                     array_to_string(
                        ws[CAST(chunk_id*{_PCHUNK}+1 AS BIGINT):CAST(chunk_id*{_PCHUNK}+{_PCHUNK} AS BIGINT)],
                        ' ') || ' [/INST]' AS prompt,
                   CAST(least({_PCHUNK}, len(ws) - chunk_id*{_PCHUNK}) AS BIGINT) AS n_tokens
            FROM c
        """,
        "pack_sequences": """
            WITH t AS (SELECT doc_id,
                    CAST(length(text) - length(replace(text,' ','')) + 1 AS BIGINT)
                        AS n_tokens
                FROM documents),
            s AS (SELECT doc_id, n_tokens,
                    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens AS BIGINT) AS token_start
                  FROM t)
            SELECT doc_id, n_tokens, token_start,
                   token_start // 256 AS first_window,
                   (token_start + n_tokens - 1) // 256 AS last_window
            FROM s
        """,
        "decontaminate": """
            WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
            g AS (SELECT doc_id, unnest(range(1, len(ws)-1)) AS i, ws FROM w),
            ng AS (SELECT doc_id,
                          array_to_string(ws[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ')
                              AS gram
                   FROM g),
            ev AS (SELECT DISTINCT gram FROM ng WHERE doc_id % 97 = 0)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
            FROM ng JOIN ev USING (gram)
            WHERE doc_id % 97 <> 0 GROUP BY doc_id
        """,
        "tfidf_topk": """
            WITH tf AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
                        FROM documents),
            tfc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM tf GROUP BY 1, 2),
            dfc AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                    FROM tf GROUP BY 1)
            SELECT doc_id, word, tf, df, score, rank FROM (
                SELECT t.doc_id, t.word, t.tf, d.df,
                       CAST(t.tf AS DOUBLE) / d.df AS score,
                       CAST(row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY CAST(t.tf AS DOUBLE)/d.df DESC, t.word)
                            AS BIGINT) AS rank
                FROM tfc t JOIN dfc d USING (word)
            ) WHERE rank <= 3
        """,
        "heavy_hitters": """
            WITH c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
                       FROM (SELECT unnest(string_split(text, ' ')) AS word
                             FROM documents)
                       GROUP BY 1)
            SELECT word, n FROM c
            WHERE n * 30 > (SELECT SUM(n) FROM c)
            ORDER BY word
        """,
        "sample_topk_hash": """
            SELECT doc_id, lang, n_chars,
                   ((doc_id % 1000003) * 2654435761) % 1000000007 AS rk
            FROM documents
            ORDER BY rk, doc_id LIMIT 100
        """,
        "vocab_topk": """
            SELECT CAST(row_number() OVER (ORDER BY n DESC, word) - 1 AS BIGINT)
                       AS token_id,
                   word, n
            FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
                  FROM (SELECT unnest(string_split(text, ' ')) AS word
                        FROM documents)
                  GROUP BY 1)
            ORDER BY n DESC, word LIMIT 1000
        """,
        "repetition_stats": """
            WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
            g AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM w),
            bg AS (SELECT doc_id,
                          ws[CAST(i AS BIGINT)] || ' ' || ws[CAST(i+1 AS BIGINT)] AS gram
                   FROM g),
            bgtop AS (
                SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count,
                       CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
                FROM (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
                GROUP BY 1)
            SELECT d.doc_id,
                   CAST(len(w.ws) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(w.ws)) AS BIGINT) AS n_distinct_words,
                   CAST(len(w.ws) - 1 AS BIGINT) AS n_bigrams,
                   coalesce(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
                   coalesce(b.top_bigram_count, 0) AS top_bigram_count
            FROM documents d JOIN w ON d.doc_id = w.doc_id
            LEFT JOIN bgtop b ON d.doc_id = b.doc_id
        """,
        "novel_docs": """
            SELECT doc_id FROM documents
            WHERE source <> 'src0'
              AND md5(lower(text)) NOT IN
                  (SELECT md5(lower(text)) FROM documents WHERE source = 'src0')
        """,
        "term_match_first": """
            SELECT d.doc_id, t.term, CAST(strpos(d.text, t.term) - 1 AS BIGINT) AS start
            FROM documents d
            CROSS JOIN (VALUES ('spark'),('join'),('window'),('merge'),('stream'),('vector'))
                 AS t(term)
            WHERE strpos(d.text, t.term) > 0
        """,
        "dedup_exact": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text
        """,
        "ngram_jaccard_pairs": """
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM documents a
            JOIN documents b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            WHERE jaccard(a.text, b.text) >= 0.9
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        "cosine_topk": """
            SELECT query_id, match_id, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                       CAST(row_number() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                                     c.vec_id) AS BIGINT) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 16 AND c.vec_id >= 16
            ) WHERE rank <= 5
        """,
        # --- r4e additions -------------------------------------------------
        "order_priority_count": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        "volume_shipping": f"""
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM({rev_cc}) AS BIGINT) AS revenue_ccents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND year(l_shipdate) BETWEEN 1996 AND 1999
            GROUP BY 1, 2, 3
        """,
        "returned_items": f"""
            SELECT c_custkey, c_name, n_name,
                   CAST(round(c_acctbal*100, 0) AS BIGINT) AS acctbal_cents,
                   revenue_ccents
            FROM (
                SELECT o_custkey, CAST(SUM({rev_cc}) AS BIGINT) AS revenue_ccents
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1997-01-01'
                  AND o_orderdate < TIMESTAMP '1997-04-01'
                GROUP BY o_custkey
                ORDER BY revenue_ccents DESC, o_custkey LIMIT 20
            )
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
        """,
        "promo_revenue": f"""
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {rev_cc}
                                 ELSE 0 END) AS BIGINT) AS promo_ccents,
                   CAST(SUM({rev_cc}) AS BIGINT) AS total_ccents
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'
        """,
        "large_volume_customers": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   CAST(round(o_totalprice*100, 0) AS BIGINT)
                       AS totalprice_cents,
                   sum_qty
            FROM (
                SELECT l_orderkey,
                       CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT))
                            AS BIGINT) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(round(l_quantity, 0) AS BIGINT)) > 170
            )
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100
        """,
        "disjunctive_revenue": f"""
            SELECT CAST(SUM({rev_cc}) AS BIGINT) AS revenue_ccents,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "sales_opportunity": """
            WITH avg_pos AS (
                SELECT CAST(SUM(CAST(round(c_acctbal*100, 0) AS BIGINT))
                            AS BIGINT) AS sum_c,
                       CAST(count(*) AS BIGINT) AS n_c
                FROM customer WHERE round(c_acctbal*100, 0) > 0)
            SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
                   CAST(SUM(CAST(round(c_acctbal*100, 0) AS BIGINT))
                        AS BIGINT) AS totacctbal_cents
            FROM customer JOIN nation ON n_nationkey = c_nationkey, avg_pos
            WHERE CAST(round(c_acctbal*100, 0) AS BIGINT) * n_c > sum_c
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY n_name
        """,
        "event_type_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "event_seq": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                        AS BIGINT) AS seq
            FROM events
        """,
        "mutual_best_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            cand AS (
                SELECT a.p_name AS name, b.p_name AS cand,
                       jaro_winkler_similarity(a.p_name, b.p_name) AS jw
                FROM names a JOIN names b
                  ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                 AND abs(length(a.p_name) - length(b.p_name)) <= 3
                 AND a.p_name <> b.p_name),
            best AS (
                SELECT name, cand, jw FROM (
                    SELECT name, cand, jw,
                           row_number() OVER (PARTITION BY name
                                              ORDER BY jw DESC, cand) AS rn
                    FROM cand) WHERE rn = 1)
            SELECT x.name AS name_a, x.cand AS name_b
            FROM best x JOIN best y ON x.name = y.cand AND x.cand = y.name
            WHERE x.name < x.cand AND x.jw >= 0.8
        """,
        "pair_features": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
                   CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name)
                              * 1000000) AS BIGINT) AS jw_ubin,
                   CAST(len(list_intersect(
                            list_distinct(string_split(a.p_name, ' ')),
                            list_distinct(string_split(b.p_name, ' '))))
                        AS BIGINT) AS tok_inter,
                   CAST(len(list_distinct(list_concat(
                            string_split(a.p_name, ' '),
                            string_split(b.p_name, ' '))))
                        AS BIGINT) AS tok_union,
                   CAST(length(a.p_name) AS BIGINT) AS len_a,
                   CAST(length(b.p_name) AS BIGINT) AS len_b
            FROM names a JOIN names b
              ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
             AND abs(length(a.p_name) - length(b.p_name)) <= 3
             AND a.p_name < b.p_name
        """,
        "cluster_metrics": """
            WITH base AS (
                SELECT split_part(p_name, ' ', 1) AS pred, p_type AS gold
                FROM part),
            cell AS (SELECT pred, gold, COUNT(*) AS n FROM base GROUP BY 1, 2),
            prow AS (SELECT pred, SUM(n) AS n FROM cell GROUP BY 1),
            grow AS (SELECT gold, SUM(n) AS n FROM cell GROUP BY 1),
            s AS (SELECT
                (SELECT CAST(SUM(n) AS BIGINT) FROM cell) AS n_records,
                (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM cell)
                    AS tp_pairs,
                (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM prow)
                    AS pred_pairs,
                (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM grow)
                    AS gold_pairs)
            SELECT n_records, tp_pairs, pred_pairs, gold_pairs,
                   CAST(tp_pairs AS DOUBLE) / pred_pairs AS pairwise_precision,
                   CAST(tp_pairs AS DOUBLE) / gold_pairs AS pairwise_recall,
                   2.0 * (CAST(tp_pairs AS DOUBLE) / pred_pairs)
                       * (CAST(tp_pairs AS DOUBLE) / gold_pairs)
                       / ((CAST(tp_pairs AS DOUBLE) / pred_pairs)
                          + (CAST(tp_pairs AS DOUBLE) / gold_pairs))
                       AS pairwise_f1
            FROM s
        """,
        "canopy_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            tok AS (SELECT DISTINCT p_name, tok FROM (
                SELECT p_name, unnest(string_split(p_name, ' ')) AS tok
                FROM names)),
            tdf AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY 1),
            canopy AS (SELECT p_name, tok AS canopy FROM (
                SELECT t.p_name, t.tok,
                       row_number() OVER (PARTITION BY t.p_name
                                          ORDER BY d.df, t.tok) AS rn
                FROM tok t JOIN tdf d USING (tok)) WHERE rn = 1)
            SELECT a.canopy AS canopy, a.p_name AS name_a, b.p_name AS name_b,
                   jaro_winkler_similarity(a.p_name, b.p_name) AS jw
            FROM canopy a JOIN canopy b
              ON a.canopy = b.canopy AND a.p_name < b.p_name
            WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.7
        """,
        "link_increment": """
            WITH newr AS (SELECT p_partkey, p_name FROM part
                          WHERE p_partkey % 10 = 0),
            base AS (SELECT DISTINCT p_name FROM part
                     WHERE p_partkey % 10 <> 0),
            cand AS (
                SELECT n.p_partkey, n.p_name, b.p_name AS base_name,
                       jaro_winkler_similarity(n.p_name, b.p_name) AS jw
                FROM newr n JOIN base b
                  ON substr(n.p_name, 1, 1) = substr(b.p_name, 1, 1)
                 AND abs(length(n.p_name) - length(b.p_name)) <= 3
                WHERE jaro_winkler_similarity(n.p_name, b.p_name) >= 0.8),
            best AS (SELECT p_partkey, base_name, jw FROM (
                SELECT p_partkey, base_name, jw,
                       row_number() OVER (PARTITION BY p_partkey
                                          ORDER BY jw DESC, base_name) AS rn
                FROM cand) WHERE rn = 1)
            SELECT n.p_partkey, n.p_name,
                   COALESCE(b.base_name, '') AS matched_name,
                   COALESCE(b.jw, 0.0) AS jw
            FROM newr n LEFT JOIN best b USING (p_partkey)
        """,
        "match_classify": """
            WITH pairs AS (
                SELECT a.p_partkey AS p_partkey_a, b.p_partkey AS p_partkey_b,
                       CAST(jaro_winkler_similarity(a.p_name, b.p_name)
                            >= 0.85 AS BIGINT) AS agree_name,
                       CAST(a.p_type = b.p_type AS BIGINT) AS agree_type,
                       CAST(abs(a.p_size - b.p_size) <= 2 AS BIGINT)
                           AS agree_size
                FROM part a JOIN part b
                  ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                 AND a.p_brand = b.p_brand
                 AND a.p_partkey < b.p_partkey),
            m AS (SELECT
                SUM(agree_type) AS n_match,
                SUM(CASE WHEN agree_type = 1 THEN agree_name ELSE 0 END)
                    AS a_name,
                SUM(CASE WHEN agree_type = 1 THEN agree_size ELSE 0 END)
                    AS a_size,
                SUM(1 - agree_type) AS n_nonmatch,
                SUM(CASE WHEN agree_type = 0 THEN agree_name ELSE 0 END)
                    AS c_name,
                SUM(CASE WHEN agree_type = 0 THEN agree_size ELSE 0 END)
                    AS c_size
                FROM pairs)
            SELECT p.p_partkey_a, p.p_partkey_b, p.agree_name, p.agree_size,
                   CAST(
                     CAST(CASE WHEN p.agree_name = 1 THEN m.a_name
                               ELSE m.n_match - m.a_name END AS HUGEINT)
                       * m.n_nonmatch
                     * (CASE WHEN p.agree_size = 1 THEN m.a_size
                             ELSE m.n_match - m.a_size END)
                       * m.n_nonmatch
                     >=
                     CAST(CASE WHEN p.agree_name = 1 THEN m.c_name
                               ELSE m.n_nonmatch - m.c_name END AS HUGEINT)
                       * m.n_match
                     * (CASE WHEN p.agree_size = 1 THEN m.c_size
                             ELSE m.n_nonmatch - m.c_size END)
                       * m.n_match
                   AS BIGINT) AS is_match
            FROM pairs p, m
        """,
        "media_nearest": f"""
            WITH media AS (
                SELECT doc_id, s.media_ref AS media_ref,
                       CAST(s."offset" AS BIGINT) AS media_offset
                FROM (SELECT doc_id, unnest(spans) AS s
                      FROM read_parquet('{docs_tbl}'))
                WHERE s.kind = 'media'),
            g AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
                         CAST("end" AS BIGINT) AS "end", concept_id
                  FROM read_parquet('{gold}')),
            cand AS (
                SELECT g.doc_id, g.start, g."end", g.concept_id,
                       m.media_ref, m.media_offset,
                       abs(m.media_offset - g.start) AS dist,
                       row_number() OVER (
                           PARTITION BY g.doc_id, g.start, g."end",
                                        g.concept_id
                           ORDER BY abs(m.media_offset - g.start),
                                    m.media_offset, m.media_ref) AS rn
                FROM g JOIN media m USING (doc_id))
            SELECT g.doc_id, g.start, g."end", g.concept_id,
                   COALESCE(c.media_ref, '') AS media_ref,
                   COALESCE(c.media_offset, -1) AS media_offset,
                   COALESCE(c.dist, -1) AS dist
            FROM g LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
              USING (doc_id, start, "end", concept_id)
        """,
        "suffix_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            sufs AS (
                SELECT p_name, substr(p_name, CAST(i AS INTEGER)) AS suf
                FROM (SELECT p_name,
                             unnest(range(1, length(p_name) - 5 + 2)) AS i
                      FROM names)),
            ok AS (SELECT suf FROM sufs GROUP BY suf
                   HAVING COUNT(*) BETWEEN 2 AND 50)
            SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
            FROM sufs a JOIN ok USING (suf) JOIN sufs b USING (suf)
            WHERE a.p_name < b.p_name
        """,
        "tf_adjustment": """
            WITH fr AS (SELECT p_name, CAST(count(*) AS BIGINT) AS f
                        FROM part GROUP BY p_name),
            g AS (SELECT CAST(sum(f) AS BIGINT) AS n,
                         CAST(sum(f * (f - 1)) AS BIGINT) AS agree2
                  FROM fr)
            SELECT p.p_partkey, p.p_name, fr.f,
                   g.n AS n_records,
                   CAST(fr.f AS DOUBLE) / CAST(g.n AS DOUBLE) AS u_val,
                   CAST(g.agree2 AS DOUBLE)
                       / CAST(g.n * (g.n - 1) AS DOUBLE) AS u_bar
            FROM part p JOIN fr USING (p_name) CROSS JOIN g
        """,
        "unlinkables": """
            WITH fr AS (SELECT p_name, CAST(count(*) AS BIGINT) AS f
                        FROM part GROUP BY p_name),
            best AS (
                SELECT a.p_name,
                       max(CAST(floor(jaro_winkler_similarity(
                           a.p_name, b.p_name) * 1000) AS BIGINT)) AS bm
                FROM fr a JOIN fr b
                  ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                 AND abs(length(a.p_name) - length(b.p_name)) <= 3
                 AND a.p_name <> b.p_name
                GROUP BY a.p_name)
            SELECT COALESCE(bm // 50, -1) AS score_bin,
                   CAST(count(*) AS BIGINT) AS n_names,
                   CAST(sum(f) AS BIGINT) AS n_records
            FROM fr LEFT JOIN best USING (p_name)
            GROUP BY 1
        """,
        "cluster_conflicts": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb
                  FROM names a JOIN names b
                    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            reach(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, u.nb FROM reach r JOIN und u ON r.dst = u.na
            ),
            cl AS (SELECT src AS p_name, min(dst) AS cluster_rep
                   FROM reach GROUP BY src)
            SELECT cl.cluster_rep,
                   CAST(count(DISTINCT p.p_name) AS BIGINT) AS n_names,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
                   CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_types,
                   CAST(min(p.p_size) AS BIGINT) AS size_min,
                   CAST(max(p.p_size) AS BIGINT) AS size_max
            FROM part p JOIN cl USING (p_name)
            GROUP BY cl.cluster_rep
        """,
        "rule_cascade": """
            WITH r1 AS (SELECT p_name, p_brand, p_size,
                               count(*) AS c, min(p_partkey) AS m
                        FROM part GROUP BY 1, 2, 3),
            r2 AS (SELECT p_name, p_brand,
                          count(*) AS c, min(p_partkey) AS m
                   FROM part GROUP BY 1, 2),
            r3 AS (SELECT p_name, count(*) AS c, min(p_partkey) AS m
                   FROM part GROUP BY 1)
            SELECT p.p_partkey,
                   CAST(CASE WHEN r1.c >= 2 THEN 1
                             WHEN r2.c >= 2 THEN 2
                             WHEN r3.c >= 2 THEN 3
                             ELSE 0 END AS BIGINT) AS rule,
                   CAST(CASE WHEN r1.c >= 2 THEN r1.m
                             WHEN r2.c >= 2 THEN r2.m
                             WHEN r3.c >= 2 THEN r3.m
                             ELSE p.p_partkey END AS BIGINT) AS canon
            FROM part p
            JOIN r1 USING (p_name, p_brand, p_size)
            JOIN r2 USING (p_name, p_brand)
            JOIN r3 USING (p_name)
        """,
        "mad_outliers": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value*100, 0) AS BIGINT) AS v
                       FROM events),
            med AS (SELECT event_type,
                           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                                AS BIGINT) AS med
                    FROM v GROUP BY 1),
            dev AS (SELECT v.event_id, v.event_type, v.v, med.med,
                           abs(v.v - med.med) AS d
                    FROM v JOIN med USING (event_type)),
            mad AS (SELECT event_type,
                           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d)
                                AS BIGINT) AS mad
                    FROM dev GROUP BY 1)
            SELECT dev.event_id, dev.event_type,
                   dev.v AS value_cents,
                   dev.med AS med_cents,
                   mad.mad AS mad_cents
            FROM dev JOIN mad USING (event_type)
            WHERE dev.d > 3 * mad.mad
        """,
        "near_events": """
            WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS u
                       FROM events)
            SELECT a.user_id,
                   a.event_id AS event_id_a,
                   b.event_id AS event_id_b,
                   b.u - a.u AS gap_us
            FROM v a JOIN v b
              ON a.user_id = b.user_id
             AND b.u > a.u
             AND b.u - a.u <= CAST(3600 AS BIGINT) * 1000000
        """,
        "media_dup_docs": f"""
            WITH m AS (
                SELECT doc_id,
                       string_agg(substring(s.media_ref, 9, 2), chr(31)
                                  ORDER BY s."offset", s.media_ref) AS sig
                FROM (SELECT doc_id, unnest(spans) AS s
                      FROM read_parquet('{docs_tbl}'))
                WHERE s.kind = 'media'
                GROUP BY doc_id),
            g AS (SELECT sig, min(doc_id) AS keeper,
                         CAST(count(*) AS BIGINT) AS n_docs
                  FROM m GROUP BY sig HAVING count(*) >= 2)
            SELECT m.doc_id, g.keeper, g.n_docs
            FROM m JOIN g USING (sig)
        """,
        "block_skew_report": """
            WITH c AS (
                SELECT substr(p_name, 1, 1) AS ch,
                       CAST(length(p_name) // 4 AS BIGINT) AS band,
                       CAST(count(*) AS BIGINT) AS n_records
                FROM part GROUP BY 1, 2)
            SELECT ch, band, n_records,
                   CAST(n_records * (n_records - 1) // 2 AS BIGINT)
                       AS n_pairs,
                   CAST(greatest(
                       (n_records * (n_records - 1) // 2 + 65535) // 65536,
                       1) AS BIGINT) AS n_salts
            FROM c
        """,
        "cheapest_supplier": """
            WITH ps AS (
                SELECT l_partkey, l_suppkey,
                       min(CAST(round(l_extendedprice*100, 0) AS BIGINT))
                           AS c
                FROM lineitem GROUP BY 1, 2),
            m AS (SELECT l_partkey, min(c) AS mc FROM ps GROUP BY 1)
            SELECT ps.l_partkey AS p_partkey,
                   ps.l_suppkey AS s_suppkey,
                   ps.c AS cost_cents,
                   s.s_name
            FROM ps
            JOIN m ON ps.l_partkey = m.l_partkey AND ps.c = m.mc
            JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        """,
        "predicted_links": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb
                  FROM names a JOIN names b
                    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            cn AS (SELECT u1.nb AS name_a, u2.nb AS name_b,
                          CAST(count(*) AS BIGINT) AS cn
                   FROM und u1 JOIN und u2
                     ON u1.na = u2.na AND u1.nb < u2.nb
                   GROUP BY 1, 2)
            SELECT cn.name_a, cn.name_b, cn.cn
            FROM cn LEFT JOIN e
              ON e.na = cn.name_a AND e.nb = cn.name_b
            WHERE e.na IS NULL AND cn.cn >= 2
        """,
        "threshold_stability": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            cand AS (SELECT a.p_name AS na, b.p_name AS nb,
                            jaro_winkler_similarity(a.p_name, b.p_name) AS jw
                     FROM names a JOIN names b
                       ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                      AND abs(length(a.p_name) - length(b.p_name)) <= 3
                      AND a.p_name < b.p_name),
            und8 AS (SELECT na, nb FROM cand WHERE jw >= 0.8
                     UNION SELECT nb, na FROM cand WHERE jw >= 0.8),
            reach8(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, u.nb FROM reach8 r JOIN und8 u ON r.dst = u.na
            ),
            cl8 AS (SELECT src AS p_name, min(dst) AS rep_lo
                    FROM reach8 GROUP BY src),
            und9 AS (SELECT na, nb FROM cand WHERE jw >= 0.9
                     UNION SELECT nb, na FROM cand WHERE jw >= 0.9),
            reach9(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, u.nb FROM reach9 r JOIN und9 u ON r.dst = u.na
            ),
            cl9 AS (SELECT src AS p_name, min(dst) AS rep_hi
                    FROM reach9 GROUP BY src)
            SELECT cl8.rep_lo AS cluster_rep,
                   CAST(count(DISTINCT cl8.p_name) AS BIGINT) AS n_names,
                   CAST(count(DISTINCT cl9.rep_hi) AS BIGINT) AS n_sub
            FROM cl8 JOIN cl9 USING (p_name)
            GROUP BY 1
        """,
        "containment_pairs": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws
                  FROM w),
            ng AS (SELECT DISTINCT doc_id,
                          array_to_string(
                              ws[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)],
                              ' ') AS gram
                   FROM g),
            ok AS (SELECT gram FROM ng GROUP BY gram
                   HAVING count(*) <= 256),
            p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                         CAST(count(*) AS BIGINT) AS n_shared
                  FROM ng a JOIN ok USING (gram) JOIN ng b USING (gram)
                  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
            sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS size_a
                   FROM ng GROUP BY 1)
            SELECT p.da AS doc_a, p.db AS doc_b, p.n_shared, sz.size_a
            FROM p JOIN sz ON sz.doc_id = p.da
            WHERE 2 * p.n_shared >= sz.size_a
        """,
        "clustering_coefficient": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb
                  FROM names a JOIN names b
                    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            deg AS (SELECT na AS p_name, CAST(count(*) AS BIGINT) AS deg
                    FROM und GROUP BY 1),
            tri AS (SELECT e1.na AS a, e1.nb AS b, e2.nb AS c
                    FROM e e1
                    JOIN e e2 ON e1.nb = e2.na
                    JOIN e e3 ON e3.na = e1.na AND e3.nb = e2.nb),
            corners AS (SELECT a AS p FROM tri
                        UNION ALL SELECT b FROM tri
                        UNION ALL SELECT c FROM tri),
            nt AS (SELECT p AS p_name, CAST(count(*) AS BIGINT) AS n_tri
                   FROM corners GROUP BY 1)
            SELECT deg.p_name, deg.deg,
                   COALESCE(nt.n_tri, 0) AS n_tri,
                   deg.deg * (deg.deg - 1) AS denom
            FROM deg LEFT JOIN nt USING (p_name)
        """,
        "wnp_pairs": """
            WITH cand AS (
                SELECT pk_a, pk_b, n_shared FROM (
                    SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
                           CAST((CASE WHEN substr(a.p_name,1,1)
                                           = substr(b.p_name,1,1)
                                 THEN 1 ELSE 0 END)
                              + (CASE WHEN a.p_size = b.p_size
                                 THEN 1 ELSE 0 END)
                              + (CASE WHEN a.p_type = b.p_type
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
                    FROM part a JOIN part b ON a.p_partkey < b.p_partkey)
                WHERE n_shared >= 2),
            nd AS (SELECT pk, CAST(sum(w) AS BIGINT) AS sw,
                          CAST(count(*) AS BIGINT) AS d
                   FROM (SELECT pk_a AS pk, n_shared AS w FROM cand
                         UNION ALL
                         SELECT pk_b, n_shared FROM cand)
                   GROUP BY 1)
            SELECT c.pk_a, c.pk_b, c.n_shared
            FROM cand c
            JOIN nd na ON na.pk = c.pk_a
            JOIN nd nb ON nb.pk = c.pk_b
            WHERE c.n_shared * na.d >= na.sw
               OR c.n_shared * nb.d >= nb.sw
        """,
        "unsupported_edges": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb
                  FROM names a JOIN names b
                    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85),
            tri AS (SELECT e1.na AS a, e1.nb AS b, e2.nb AS c
                    FROM e e1
                    JOIN e e2 ON e1.nb = e2.na
                    JOIN e e3 ON e3.na = e1.na AND e3.nb = e2.nb),
            sup AS (SELECT a AS na, b AS nb FROM tri
                    UNION SELECT b, c FROM tri
                    UNION SELECT a, c FROM tri)
            SELECT e.na AS name_a, e.nb AS name_b
            FROM e LEFT JOIN sup ON sup.na = e.na AND sup.nb = e.nb
            WHERE sup.na IS NULL
        """,
        "winsorized_stats": """
            WITH v AS (SELECT event_type,
                              CAST(round(value*100, 0) AS BIGINT) AS v
                       FROM events),
            th AS (SELECT event_type,
                          CAST(percentile_disc(0.05) WITHIN GROUP
                               (ORDER BY v) AS BIGINT) AS lo_cents,
                          CAST(percentile_disc(0.95) WITHIN GROUP
                               (ORDER BY v) AS BIGINT) AS hi_cents
                   FROM v GROUP BY 1)
            SELECT v.event_type, th.lo_cents, th.hi_cents,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN v.v < th.lo_cents THEN th.lo_cents
                                 WHEN v.v > th.hi_cents THEN th.hi_cents
                                 ELSE v.v END) AS BIGINT) AS sum_clipped
            FROM v JOIN th USING (event_type)
            GROUP BY 1, 2, 3
        """,
        "media_dup_text_check": f"""
            WITH m AS (
                SELECT doc_id,
                       string_agg(substring(s.media_ref, 9, 2), chr(31)
                                  ORDER BY s."offset", s.media_ref) AS sig
                FROM (SELECT doc_id, unnest(spans) AS s
                      FROM read_parquet('{docs_tbl}'))
                WHERE s.kind = 'media'
                GROUP BY doc_id),
            g AS (SELECT sig, min(doc_id) AS keeper
                  FROM m GROUP BY sig HAVING count(*) >= 2),
            pairs AS (SELECT m.doc_id, g.keeper
                      FROM m JOIN g USING (sig)
                      WHERE m.doc_id <> g.keeper),
            tx AS (SELECT doc_id,
                          array_to_string(
                              list_transform(
                                  list_filter(spans, s -> s.kind = 'text'),
                                  s -> s.text), '') AS t
                   FROM read_parquet('{docs_tbl}'))
            SELECT p.doc_id, p.keeper,
                   CAST(floor(jaccard(ta.t, tb.t) * 1000000) AS BIGINT)
                       AS jacc_micro,
                   CAST(CASE WHEN floor(jaccard(ta.t, tb.t) * 1000000)
                                  >= 500000
                             THEN 1 ELSE 0 END AS BIGINT) AS consistent
            FROM pairs p
            JOIN tx ta ON ta.doc_id = p.doc_id
            JOIN tx tb ON tb.doc_id = p.keeper
        """,
        "fd_violations": """
            WITH f1 AS (SELECT p_name AS g, count(DISTINCT p_brand) AS nb,
                               count(*) AS r FROM part GROUP BY 1),
            f2 AS (SELECT p_name AS g, count(DISTINCT p_type) AS nb,
                          count(*) AS r FROM part GROUP BY 1),
            f3 AS (SELECT p_brand AS g, count(DISTINCT p_type) AS nb,
                          count(*) AS r FROM part GROUP BY 1),
            f4 AS (SELECT CAST(o_custkey AS VARCHAR) AS g,
                          count(DISTINCT o_orderpriority) AS nb,
                          count(*) AS r FROM orders GROUP BY 1)
            SELECT 'part' AS tbl, 'p_name' AS lhs, 'p_brand' AS rhs,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating_groups,
                   CAST(sum(CASE WHEN nb > 1 THEN r ELSE 0 END) AS BIGINT)
                       AS n_violating_rows
            FROM f1
            UNION ALL
            SELECT 'part', 'p_name', 'p_type',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN nb > 1 THEN r ELSE 0 END) AS BIGINT)
            FROM f2
            UNION ALL
            SELECT 'part', 'p_brand', 'p_type',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN nb > 1 THEN r ELSE 0 END) AS BIGINT)
            FROM f3
            UNION ALL
            SELECT 'orders', 'o_custkey', 'o_orderpriority',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN nb > 1 THEN r ELSE 0 END) AS BIGINT)
            FROM f4
        """,
        # r4r: 2-round exact-integer truth discovery (latest claim per
        # (object, source), majority -> floor-micro accuracy -> weighted
        # revote, ties to the smallest bucket at every argmax)
        "truth_discovery": """
            WITH claims AS (
              SELECT user_id, event_type AS src,
                     COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), 0)
                         // 10 AS v
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events) WHERE rn = 1),
            vote1 AS (SELECT user_id, v, count(*) AS c
                      FROM claims GROUP BY 1, 2),
            truth1 AS (SELECT user_id, v FROM (
                SELECT user_id, v, row_number() OVER (
                    PARTITION BY user_id ORDER BY c DESC, v ASC) AS rn
                FROM vote1) WHERE rn = 1),
            acc AS (SELECT src,
                           SUM(CASE WHEN c.v = t.v THEN 1 ELSE 0 END) AS num,
                           count(*) AS den
                    FROM claims c JOIN truth1 t USING (user_id)
                    GROUP BY src),
            w AS (SELECT src, CAST(num * 1000000 // den AS BIGINT) AS wt
                  FROM acc),
            vote2 AS (SELECT user_id, v, CAST(SUM(wt) AS BIGINT) AS weight,
                             CAST(count(*) AS BIGINT) AS n_support
                      FROM claims JOIN w USING (src) GROUP BY 1, 2)
            SELECT user_id, v AS value_bin, weight, n_support FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY weight DESC, v ASC) AS rn
                FROM vote2) WHERE rn = 1
        """,
        # r4r: set-Jaccard group linkage over ordered-part sets; members
        # with df > 256 are stop-members on BOTH sides of the compare
        "group_linkage": """
            WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                        FROM orders o
                        JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
            keep AS (SELECT p FROM cp GROUP BY p
                     HAVING count(*) <= 256),
            cpk AS (SELECT cp.c, cp.p FROM cp JOIN keep USING (p)),
            sz AS (SELECT c, count(*) AS n FROM cp GROUP BY c),
            ov AS (SELECT a.c AS c_a, b.c AS c_b, count(*) AS n_inter
                   FROM cpk a JOIN cpk b ON a.p = b.p AND a.c < b.c
                   GROUP BY 1, 2)
            SELECT ov.c_a, ov.c_b, CAST(ov.n_inter AS BIGINT) AS n_inter,
                   CAST(sa.n + sb.n - ov.n_inter AS BIGINT) AS n_union
            FROM ov JOIN sz sa ON sa.c = ov.c_a
                    JOIN sz sb ON sb.c = ov.c_b
            WHERE 10 * ov.n_inter >= 1 * (sa.n + sb.n - ov.n_inter)
        """,
        # r4r: C4-style fixed-window segment dedup (keeper = global min
        # (doc_id, seg_idx) per segment text)
        "segment_dedup": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            segs AS (
              SELECT doc_id, s.j AS seg_idx,
                     array_to_string(ws[(s.j*20+1):(s.j*20+20)], ' ') AS seg
              FROM w, LATERAL (SELECT unnest(generate_series(
                       0, CAST(ceil(len(ws)/20.0) AS BIGINT) - 1)) AS j) s),
            ranked AS (SELECT doc_id, seg_idx,
                              row_number() OVER (PARTITION BY seg
                                  ORDER BY doc_id, seg_idx) AS rn
                       FROM segs)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_removed
            FROM ranked GROUP BY doc_id
        """,
        # r4s: directed distinct-value containment over the fixed column
        # inventory (schema metadata — mirrored from JOINDISC_COLS)
        "join_discovery": """
            WITH u AS (
              SELECT 'region.r_regionkey' AS col, CAST(r_regionkey AS BIGINT) AS v FROM (SELECT DISTINCT r_regionkey FROM region)
              UNION ALL SELECT 'nation.n_nationkey', CAST(n_nationkey AS BIGINT) FROM (SELECT DISTINCT n_nationkey FROM nation)
              UNION ALL SELECT 'nation.n_regionkey', CAST(n_regionkey AS BIGINT) FROM (SELECT DISTINCT n_regionkey FROM nation)
              UNION ALL SELECT 'customer.c_custkey', CAST(c_custkey AS BIGINT) FROM (SELECT DISTINCT c_custkey FROM customer)
              UNION ALL SELECT 'customer.c_nationkey', CAST(c_nationkey AS BIGINT) FROM (SELECT DISTINCT c_nationkey FROM customer)
              UNION ALL SELECT 'supplier.s_suppkey', CAST(s_suppkey AS BIGINT) FROM (SELECT DISTINCT s_suppkey FROM supplier)
              UNION ALL SELECT 'supplier.s_nationkey', CAST(s_nationkey AS BIGINT) FROM (SELECT DISTINCT s_nationkey FROM supplier)
              UNION ALL SELECT 'part.p_partkey', CAST(p_partkey AS BIGINT) FROM (SELECT DISTINCT p_partkey FROM part)
              UNION ALL SELECT 'orders.o_orderkey', CAST(o_orderkey AS BIGINT) FROM (SELECT DISTINCT o_orderkey FROM orders)
              UNION ALL SELECT 'orders.o_custkey', CAST(o_custkey AS BIGINT) FROM (SELECT DISTINCT o_custkey FROM orders)
              UNION ALL SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS BIGINT) FROM (SELECT DISTINCT l_orderkey FROM lineitem)
              UNION ALL SELECT 'lineitem.l_partkey', CAST(l_partkey AS BIGINT) FROM (SELECT DISTINCT l_partkey FROM lineitem)
              UNION ALL SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS BIGINT) FROM (SELECT DISTINCT l_suppkey FROM lineitem)
              UNION ALL SELECT 'events.event_id', CAST(event_id AS BIGINT) FROM (SELECT DISTINCT event_id FROM events)
              UNION ALL SELECT 'events.user_id', CAST(user_id AS BIGINT) FROM (SELECT DISTINCT user_id FROM events)
              UNION ALL SELECT 'documents.doc_id', CAST(doc_id AS BIGINT) FROM (SELECT DISTINCT doc_id FROM documents)
              UNION ALL SELECT 'embeddings.vec_id', CAST(vec_id AS BIGINT) FROM (SELECT DISTINCT vec_id FROM embeddings)
            ),
            sz AS (SELECT col, count(*) AS n FROM u GROUP BY col),
            ov AS (SELECT a.col AS col_a, b.col AS col_b,
                          count(*) AS n_inter
                   FROM u a JOIN u b ON a.v = b.v AND a.col <> b.col
                   GROUP BY 1, 2)
            SELECT ov.col_a, ov.col_b, CAST(sa.n AS BIGINT) AS n_a,
                   CAST(ov.n_inter AS BIGINT) AS n_inter
            FROM ov JOIN sz sa ON sa.col = ov.col_a
            WHERE 2 * ov.n_inter >= 1 * sa.n
        """,
        # r4t: the salted execution must emit EXACTLY the unsalted
        # blocked-fuzzy pair set (the q_fuzzy_name_pairs predicate)
        "salted_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b
            FROM names a JOIN names b
              ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
             AND abs(length(a.p_name) - length(b.p_name)) <= 3
             AND a.p_name < b.p_name
            WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8
        """,
        # r4u: last-op-wins CDC apply with delete markers
        "cdc_state": """
            SELECT user_id, event_type AS op,
                   CAST(round(value*100, 0) AS BIGINT) AS value_cents
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # r4u: exact global rank under the RNG-free mixer
        "shuffle_index": """
            SELECT doc_id,
                   ((doc_id % 1000003) * 2654435761) % 1000000007 AS rk,
                   CAST(row_number() OVER (
                       ORDER BY ((doc_id % 1000003) * 2654435761)
                                % 1000000007, doc_id) - 1 AS BIGINT)
                       AS shuffle_pos
            FROM documents
        """,
        # r4v: per-pair FS field contributions in floor micro-units
        "match_explain": """
            WITH pairs AS (
                SELECT a.p_partkey AS p_partkey_a, b.p_partkey AS p_partkey_b,
                       CAST(jaro_winkler_similarity(a.p_name, b.p_name)
                            >= 0.85 AS BIGINT) AS agree_name,
                       CAST(a.p_type = b.p_type AS BIGINT) AS agree_type,
                       CAST(abs(a.p_size - b.p_size) <= 2 AS BIGINT)
                           AS agree_size
                FROM part a JOIN part b
                  ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
                 AND a.p_brand = b.p_brand
                 AND a.p_partkey < b.p_partkey),
            m AS (SELECT
                SUM(agree_type) AS n_match,
                SUM(CASE WHEN agree_type = 1 THEN agree_name ELSE 0 END)
                    AS a_name,
                SUM(CASE WHEN agree_type = 1 THEN agree_size ELSE 0 END)
                    AS a_size,
                SUM(1 - agree_type) AS n_nonmatch,
                SUM(CASE WHEN agree_type = 0 THEN agree_name ELSE 0 END)
                    AS c_name,
                SUM(CASE WHEN agree_type = 0 THEN agree_size ELSE 0 END)
                    AS c_size
                FROM pairs)
            SELECT p.p_partkey_a, p.p_partkey_b, 'name' AS field,
                   p.agree_name AS agree,
                   CAST(CASE WHEN
                        CAST(CASE WHEN p.agree_name = 1 THEN m.c_name
                             ELSE m.n_nonmatch - m.c_name END AS HUGEINT)
                            * m.n_match = 0
                        THEN 1000000000000000
                        ELSE LEAST(
                          CAST(CASE WHEN p.agree_name = 1 THEN m.a_name
                               ELSE m.n_match - m.a_name END AS HUGEINT)
                            * m.n_nonmatch * 1000000
                          // (CAST(CASE WHEN p.agree_name = 1 THEN m.c_name
                                   ELSE m.n_nonmatch - m.c_name END AS HUGEINT)
                              * m.n_match),
                          1000000000000000) END AS BIGINT) AS wt_micro
            FROM pairs p, m
            UNION ALL
            SELECT p.p_partkey_a, p.p_partkey_b, 'size',
                   p.agree_size,
                   CAST(CASE WHEN
                        CAST(CASE WHEN p.agree_size = 1 THEN m.c_size
                             ELSE m.n_nonmatch - m.c_size END AS HUGEINT)
                            * m.n_match = 0
                        THEN 1000000000000000
                        ELSE LEAST(
                          CAST(CASE WHEN p.agree_size = 1 THEN m.a_size
                               ELSE m.n_match - m.a_size END AS HUGEINT)
                            * m.n_nonmatch * 1000000
                          // (CAST(CASE WHEN p.agree_size = 1 THEN m.c_size
                                   ELSE m.n_nonmatch - m.c_size END AS HUGEINT)
                              * m.n_match),
                          1000000000000000) END AS BIGINT)
            FROM pairs p, m
        """,
        # r4x: overlapping sliding-window chunker (width 200 / stride 150)
        "chunk_overlap": """
            SELECT doc_id, CAST(start // 150 AS BIGINT) AS chunk_id,
                   CAST(start AS BIGINT) AS start,
                   CAST(least(200, length(text) - start) AS BIGINT)
                       AS chunk_len,
                   substr(text, CAST(start AS INT) + 1, 200) AS chunk
            FROM (SELECT doc_id, text,
                         unnest(range(0, greatest(length(text), 1), 150))
                             AS start
                  FROM documents)
        """,
        # r4x: per-source mixture quotas under the RNG-free mixer
        "mix_sources": """
            SELECT source, doc_id, rk, pos FROM (
                SELECT source, doc_id,
                       ((doc_id % 1000003) * 2654435761) % 1000000007 AS rk,
                       row_number() OVER (PARTITION BY source
                           ORDER BY ((doc_id % 1000003) * 2654435761)
                                    % 1000000007, doc_id) AS pos
                FROM documents)
            WHERE pos <= 40 + 30 * (CAST(substr(source, 4) AS BIGINT) % 3)
        """,
        # r4x: SCD Type-2 validity intervals (2^62 open-interval sentinel)
        "scd2_history": """
            SELECT user_id, event_id,
                   CAST(round(value*100, 0) AS BIGINT) AS value_cents,
                   epoch_us(ts) AS valid_from_us,
                   COALESCE(lead(epoch_us(ts)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id),
                            4611686018427387904) AS valid_to_us
            FROM events
        """,
        # r4x: Ditto-style COL/VAL pair serialization over the
        # match_classify blocked population
        "pair_serialize": """
            SELECT a.p_partkey AS p_partkey_a, b.p_partkey AS p_partkey_b,
                   'COL name VAL ' || a.p_name || ' COL brand VAL '
                   || a.p_brand || ' COL size VAL '
                   || CAST(a.p_size AS VARCHAR) || ' [SEP] COL name VAL '
                   || b.p_name || ' COL brand VAL ' || b.p_brand
                   || ' COL size VAL ' || CAST(b.p_size AS VARCHAR)
                       AS pair_text
            FROM part a JOIN part b
              ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
             AND a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        """,
        # r4y: quasi-identifier groups below the k-anonymity floor
        "k_anonymity": """
            SELECT c_mktsegment,
                   (CAST(round(c_acctbal*100, 0) AS BIGINT) + 100000)
                       // 100000 AS bal_band,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2 HAVING count(*) < 20
        """,
        # r4y: zero-filled calendar spine over the observed hourly span
        "dense_hourly": """
            WITH b AS (SELECT CAST(epoch_us(min(ts)) // 3600000000 AS BIGINT)
                                  AS lo,
                              CAST(epoch_us(max(ts)) // 3600000000 AS BIGINT)
                                  AS hi
                       FROM events),
            hours AS (SELECT unnest(range((SELECT lo FROM b),
                                          (SELECT hi FROM b) + 1)) AS hour),
            types AS (SELECT DISTINCT event_type FROM events),
            counts AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT)
                                  AS hour,
                              event_type, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2)
            SELECT h.hour, t.event_type, COALESCE(c.n, 0) AS n
            FROM hours h CROSS JOIN types t
            LEFT JOIN counts c
              ON c.hour = h.hour AND c.event_type = t.event_type
        """,
        # r4y: dim_truncation_recall moved to the oracle-backed set (a
        # sequential mirror of the engine's float64 contract) — the SQL
        # formulation put DuckDB float32 list_cosine_similarity at the
        # rank-k boundary of BOTH differenced top-k sets (review finding)
        # r4z: inverse-cluster-size sampling weights over the dup_clusters
        # labels (the oracle parquet is the independently-generated
        # component labeling; sizes + floor division are pure SQL)
        "dedup_weights": f"""
            WITH c AS (SELECT * FROM
                           read_parquet('{odir}/dup_clusters.parquet')),
            s AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
                  FROM c GROUP BY 1)
            SELECT c.doc_id, s.sz AS cluster_size,
                   CAST(1000000 // s.sz AS BIGINT) AS weight_micro
            FROM c JOIN s USING (cluster_id)
        """,
        # r4aa: per-cluster minimum-similarity match edge
        "weakest_link": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name AS na, b.p_name AS nb,
                         CAST(floor(jaro_winkler_similarity(
                                  a.p_name, b.p_name)*1000000)
                              AS BIGINT) AS jw_micro
                  FROM names a JOIN names b
                    ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                   AND abs(length(a.p_name) - length(b.p_name)) <= 3
                   AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            reach(src, dst) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT r.src, u.nb FROM reach r JOIN und u ON r.dst = u.na
            ),
            lab AS (SELECT src AS p_name, min(dst) AS rep
                    FROM reach GROUP BY src)
            SELECT cluster_rep, name_a, name_b, jw_micro FROM (
                SELECT l.rep AS cluster_rep, e.na AS name_a,
                       e.nb AS name_b, e.jw_micro,
                       row_number() OVER (PARTITION BY l.rep
                           ORDER BY e.jw_micro, e.na, e.nb) AS rn
                FROM e JOIN lab l ON l.p_name = e.na)
            WHERE rn = 1
        """,
        # r4aa: cross-source near-dup pair matrix over the independently-
        # generated minhash verified pairs
        "source_overlap": f"""
            WITH p AS (SELECT * FROM
                           read_parquet('{odir}/minhash_lsh_pairs.parquet')),
            d AS (SELECT doc_id, source FROM documents)
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM p JOIN d da ON da.doc_id = p.doc_a
                   JOIN d db ON db.doc_id = p.doc_b
            GROUP BY 1, 2
        """,
        # r4ai: candidate blocking schemes' RR/PC trade-off table
        "blocking_compare": """
            WITH t AS (SELECT substr(p_name,1,1) AS ch, p_brand, p_size,
                              p_type
                       FROM part),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
            tr AS (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT) AS tp
                   FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                         GROUP BY p_type)),
            s_ch_brand AS (SELECT 'ch_brand' AS scheme,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY ch, p_brand)) AS blocked_pairs,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY ch, p_brand, p_type)) AS true_blocked_pairs),
            s_ch AS (SELECT 'ch' AS scheme,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY ch)) AS blocked_pairs,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY ch, p_type)) AS true_blocked_pairs),
            s_brand_size AS (SELECT 'brand_size' AS scheme,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY p_brand, p_size)) AS blocked_pairs,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY p_brand, p_size, p_type))
                    AS true_blocked_pairs),
            s_size AS (SELECT 'size' AS scheme,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY p_size)) AS blocked_pairs,
                (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT)
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM t
                       GROUP BY p_size, p_type)) AS true_blocked_pairs)
            SELECT s_ch_brand.scheme, s_ch_brand.blocked_pairs,
                   s_ch_brand.true_blocked_pairs,
                   CAST((tot.n*(tot.n-1)//2 - s_ch_brand.blocked_pairs)
                        * 1000000 // (tot.n*(tot.n-1)//2) AS BIGINT)
                       AS rr_micro,
                   CAST(s_ch_brand.true_blocked_pairs * 1000000 // tr.tp
                        AS BIGINT) AS pc_micro
            FROM s_ch_brand, tot, tr
            UNION ALL
            SELECT s_ch.scheme, s_ch.blocked_pairs, s_ch.true_blocked_pairs,
                   CAST((tot.n*(tot.n-1)//2 - s_ch.blocked_pairs)
                        * 1000000 // (tot.n*(tot.n-1)//2) AS BIGINT),
                   CAST(s_ch.true_blocked_pairs * 1000000 // tr.tp AS BIGINT)
            FROM s_ch, tot, tr
            UNION ALL
            SELECT s_brand_size.scheme, s_brand_size.blocked_pairs,
                   s_brand_size.true_blocked_pairs,
                   CAST((tot.n*(tot.n-1)//2 - s_brand_size.blocked_pairs)
                        * 1000000 // (tot.n*(tot.n-1)//2) AS BIGINT),
                   CAST(s_brand_size.true_blocked_pairs * 1000000 // tr.tp
                        AS BIGINT)
            FROM s_brand_size, tot, tr
            UNION ALL
            SELECT s_size.scheme, s_size.blocked_pairs,
                   s_size.true_blocked_pairs,
                   CAST((tot.n*(tot.n-1)//2 - s_size.blocked_pairs)
                        * 1000000 // (tot.n*(tot.n-1)//2) AS BIGINT),
                   CAST(s_size.true_blocked_pairs * 1000000 // tr.tp
                        AS BIGINT)
            FROM s_size, tot, tr
        """,
        # r4ai: histogram-intersection kernel over (source, word) counts
        "source_similarity": """
            WITH wc AS (SELECT source, unnest(string_split(text, ' '))
                            AS word
                        FROM documents),
            h AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
                  FROM wc WHERE word <> '' GROUP BY 1, 2)
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(SUM(least(a.c, b.c)) AS BIGINT) AS intersection
            FROM h a JOIN h b ON a.word = b.word AND a.source < b.source
            GROUP BY 1, 2
        """,
        # r4ah: exact join cardinality from per-key degree products
        "join_size_estimate": """
            WITH do_ AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS d
                         FROM orders GROUP BY 1),
            dl AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS d
                   FROM lineitem GROUP BY 1)
            SELECT CAST(SUM(do_.d * dl.d) AS BIGINT) AS join_size,
                   CAST((SELECT count(*) FROM do_) AS BIGINT) AS n_left_keys,
                   CAST((SELECT count(*) FROM dl) AS BIGINT) AS n_right_keys
            FROM do_ JOIN dl ON do_.k = dl.k
        """,
        # r4ah: strict two-hop neighbors (reachable in 2 hops, not 1)
        "two_hop_reach": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            e AS (SELECT a.p_name na, b.p_name nb FROM names a JOIN names b
                  ON substr(a.p_name,1,1) = substr(b.p_name,1,1)
                 AND abs(length(a.p_name) - length(b.p_name)) <= 3
                 AND a.p_name < b.p_name
                  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
            und AS (SELECT na, nb FROM e UNION SELECT nb, na FROM e),
            h2 AS (SELECT DISTINCT u1.na AS src, u2.nb AS dst
                   FROM und u1 JOIN und u2 ON u1.nb = u2.na
                   WHERE u2.nb <> u1.na),
            pure AS (SELECT h2.src, h2.dst FROM h2
                     LEFT JOIN und ON und.na = h2.src AND und.nb = h2.dst
                     WHERE und.na IS NULL)
            SELECT src AS p_name, CAST(count(*) AS BIGINT) AS n_two_hop
            FROM pure GROUP BY 1
        """,
        # r4ag: fixed expectation suite over four tables
        "dq_checks": """
            SELECT 'orders_totalprice_nonneg' AS rule,
                   CAST(count(*) AS BIGINT) AS n_checked,
                   CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations
            FROM orders
            UNION ALL
            SELECT 'lineitem_qty_range', CAST(count(*) AS BIGINT),
                   CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'customer_key_unique', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
            FROM customer
            UNION ALL
            SELECT 'events_value_nonnull', CAST(count(*) AS BIGINT),
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM events
        """,
        # r4ag: missing-day runs per user (the islands' holes)
        "user_day_gaps": """
            WITH ud AS (SELECT DISTINCT user_id,
                               CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                                   AS day
                        FROM events)
            SELECT user_id, gap_start, gap_end FROM (
                SELECT user_id, day + 1 AS gap_start,
                       lead(day) OVER (PARTITION BY user_id ORDER BY day) - 1
                           AS gap_end
                FROM ud)
            WHERE gap_end >= gap_start
        """,
        # r4af: running total resetting at the error marker row
        "reset_running_total": """
            SELECT event_id, user_id,
                   CAST(SUM(cents) OVER (PARTITION BY user_id, seg
                            ORDER BY ts, event_id) AS BIGINT) AS run_cents
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value*100, 0) AS BIGINT) AS cents,
                         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                             OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS seg
                  FROM events)
        """,
        # r4ae: distinct-user intersections per event-type pair
        "type_cooccurrence": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        # r4ad: ntile lift table over per-user lifetime cents
        "decile_lift": """
            WITH t AS (SELECT user_id,
                              CAST(SUM(CAST(round(value*100, 0) AS BIGINT))
                                   AS BIGINT) AS cents
                       FROM events GROUP BY 1),
            d AS (SELECT user_id, cents,
                         CAST(ntile(10) OVER (ORDER BY cents DESC, user_id)
                              AS BIGINT) AS decile
                  FROM t)
            SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(SUM(cents) AS BIGINT) AS total_cents
            FROM d GROUP BY 1
        """,
        # r4ad: lag-24 forecast error over the zero-filled hourly spine
        "seasonal_naive": """
            WITH b AS (SELECT CAST(epoch_us(min(ts)) // 3600000000 AS BIGINT)
                                  AS lo,
                              CAST(epoch_us(max(ts)) // 3600000000 AS BIGINT)
                                  AS hi
                       FROM events),
            hours AS (SELECT unnest(range((SELECT lo FROM b),
                                          (SELECT hi FROM b) + 1)) AS hour),
            types AS (SELECT DISTINCT event_type FROM events),
            counts AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT)
                                  AS hour,
                              event_type, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            spine AS (SELECT h.hour, t.event_type, COALESCE(c.n, 0) AS n
                      FROM hours h CROSS JOIN types t
                      LEFT JOIN counts c
                        ON c.hour = h.hour AND c.event_type = t.event_type),
            lagged AS (SELECT event_type, n,
                              lag(n, 24) OVER (PARTITION BY event_type
                                               ORDER BY hour) AS prev
                       FROM spine)
            SELECT event_type, CAST(count(prev) AS BIGINT) AS n_forecasts,
                   CAST(SUM(abs(n - prev)) AS BIGINT) AS abs_err_sum
            FROM lagged WHERE prev IS NOT NULL GROUP BY 1
        """,
        # r4z: mergeable log2-binned quantile lower bounds
        "quantile_sketch": """
            WITH b AS (
              SELECT event_type,
                     CASE WHEN CAST(round(value*100, 0) AS BIGINT) <= 0
                          THEN 0
                          ELSE length(format('{:b}',
                               CAST(round(value*100, 0) AS BIGINT)))
                     END AS bin
              FROM events),
            h AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
            c AS (SELECT event_type, bin, n,
                         sum(n) OVER (PARTITION BY event_type
                                      ORDER BY bin) AS cum,
                         sum(n) OVER (PARTITION BY event_type) AS total
                  FROM h)
            SELECT event_type,
                   CAST(min(CASE WHEN 2*cum >= total THEN
                        CASE WHEN bin = 0 THEN 0
                             ELSE (1::BIGINT << (bin-1)) END END)
                     AS BIGINT) AS p50_lb,
                   CAST(min(CASE WHEN 10*cum >= 9*total THEN
                        CASE WHEN bin = 0 THEN 0
                             ELSE (1::BIGINT << (bin-1)) END END)
                     AS BIGINT) AS p90_lb
            FROM c GROUP BY 1
        """,
    }
