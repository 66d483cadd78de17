"""Driver-gate rehearsal: every formerly rows-only query must match its
oracle (independent single-process implementation → parquet, or direct
DuckDB SQL) exactly — row count, sorted columns, values — the same compare
the correctness driver runs at sf=0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.01"

ORACLE_BACKED = [
    # r4o additions
    "latest_user_state",
    "grouped_corr",
    "table_checksum",
    "weighted_sample",
    "bpe_merges",
    "compose_pipeline",
    "doc_freq",
    "len_quantiles",
    "sample_stratified",
    "langid",
    "llm_prompts",
    "dict_majority",
    "allowed_sections",
    "dict_precision",
    "media_inventory",
    "frame_samples",
    "simhash_buckets",
    "minhash_lsh_pairs",
    "cosine_topk_ivf",
    "encoder_topk",
    "entity_link_mentions",
    "entity_link",
    "entity_link_eval_iou",
    "llm_ner",
    "approx_users",
    "bm25_topk",
    "winnow_dups",
    "cosine_topk_lsh",
    "dup_clusters",
    "pack_sequences",
    "decontaminate",
    "tfidf_topk",
    "novel_docs",
    "quality_score",
    "repetition_stats",
    "vocab_topk",
    "span_stats",
    "media_bucket_pairs",
    "sample_topk_hash",
    "heavy_hitters",
    "rollup_summary",
    "grouped_median",
    "customer_event_summary",
    "json_field_sum",
    "cohort_retention",
    # r4 additions + the prefix-filter ngram_jaccard rewrite
    "event_gaps",
    "shipping_priority",
    "local_supplier_volume",
    "redact_terms",
    "quality_filter",
    "bigram_lift",
    "ngram_jaccard_pairs",
    # r4b: ER blocking family + relational additions
    "fuzzy_name_pairs",
    "sorted_neighborhood_pairs",
    "customer_order_distribution",
    "sliding_activity",
    "kmeans_clusters",
    "order_event_window",
    "posting_lists",
    "funnel_conversion",
    # r4c: Fellegi-Sunter pattern histogram + survivorship
    "match_patterns",
    "golden_user_profile",
    "name_clusters",
    # r4d: m/u estimation, blocking evaluation, meta-blocking pruning
    "match_weights",
    "blocking_metrics",
    "metablocking_pairs",
    "match_roc",
    "small_qty_revenue",
    "market_share",
    # r4e: TPC-H Q4/Q7/Q10/Q14/Q18/Q19/Q22 shapes, pivot, row_number,
    # mutual-best 1:1 matching, pair feature vectors
    "order_priority_count",
    "volume_shipping",
    "returned_items",
    "promo_revenue",
    "large_volume_customers",
    "disjunctive_revenue",
    "sales_opportunity",
    "event_type_pivot",
    "event_seq",
    "mutual_best_pairs",
    "pair_features",
    "phonetic_pairs",
    # r4: user-bucketed streaming rewrites + scaled as-of buckets (VERDICT
    # items 1/4) — rewritten after their r03 driver rows, so the rehearsal
    # must re-pin them
    "sessionize",
    "rolling_user_value",
    "first_event_per_user",
    "user_event_type_counts",
    "latest_order_before_event",
    # r4f: cluster-quality evaluation, canopy blocking, incremental linkage
    "cluster_metrics",
    "canopy_pairs",
    "link_increment",
    "match_classify",
    "media_nearest",
    "suffix_pairs",
    # r4h: added after the r4 gate order was frozen — never driver-gated,
    # so the rehearsal is their correctness evidence until the r5 row
    "top_supplier",
    "lone_return_supplier",
    "monge_elkan_pairs",
    "cube_summary",
    "exact_quantiles",
    # r4i: Q12 shape, B-cubed eval, lexical diversity, length-band filter
    "shipmode_priority",
    "bcubed_metrics",
    "token_diversity",
    "length_band_filter",
    "user_modal_event",
    "canonical_names",
    "length_cdf",
    "ari_metric",
    "edit_neighbors",
    "hamming_neighbors",
    "oov_rate",
    "grouped_variance",
    "knn_classify",
    "prefix_dups",
    "user_event_path",
    "priority_revenue_share",
    "freq_of_freqs",
    "multipass_pairs",
    "substring_contamination",
    "event_transitions",
    "hourly_distinct_users",
    "next_event_after_order",
    # r4j: MMR diversified top-k + TPC-H Q9/Q20/Q16 shapes
    "mmr_topk",
    "nation_profit",
    "qualified_suppliers",
    "brand_supplier_counts",
    "span_kind_signature",
    "pair_triangles",
    "char_entropy",
    "em_weights",
    "value_histogram",
    "strip_media_remap",
    "lm_perplexity",
    "late_events",
    "segment_runs",
    "pq_codes",
    "soft_tfidf_pairs",
    "dup_rate_by_source",
    "decontaminate_bloom",
    "qgram_overlap_pairs",
    "audience_overlap",
    "media_context",
    "value_outliers",
    "match_degree_hist",
    "dedup_keep_best",
    "ann_recall",
    "user_first_last",
    "top2_gap",
    "transitive_pairs",
    "order_latency",
    "top_words_per_lang",
    "compression_ratio",
    "span_transitions",
    "match_pagerank",
    "simhash_pairs",
    "hourly_delta",
    "vocab_growth",
    "rrf_fusion",
    "fk_audit",
    "twa_user_value",
    "profile_columns",
    "uncertain_pairs",
    "ppjoin_pairs",
    "fully_returned_orders",
    "pareto_orders",
    # r4p: interleaved-payload linkage clusters + clean-clean two-source
    # best-match linkage
    "media_clusters",
    "crosslink_best",
    "greedy_assignment",
    "kcore",
    "pprl_pairs",
    "stable_matching",
    # r4q: Splink-style TF adjustment, unlinkables chart, merged-cluster
    # consistency audit, deterministic match-rule cascade
    "tf_adjustment",
    "unlinkables",
    "cluster_conflicts",
    "rule_cascade",
    "mad_outliers",
    "near_events",
    "media_dup_docs",
    "block_skew_report",
    "cheapest_supplier",
    "cosine_range",
    "predicted_links",
    "threshold_stability",
    "containment_pairs",
    "knn_join",
    "clustering_coefficient",
    "fd_violations",
    "wnp_pairs",
    "unsupported_edges",
    "winsorized_stats",
    "media_dup_text_check",
    # r4r: truth discovery, group linkage, KwikCluster, segment dedup
    "truth_discovery",
    "group_linkage",
    "cc_pivot",
    "segment_dedup",
    # r4s: join discovery, BPE encode, hard negatives
    "join_discovery",
    "bpe_tokens",
    "hard_negatives",
    # r4t: executed salting, KMV sketch
    "salted_pairs",
    "kmv_users",
    # r4u: CDC apply, deterministic shuffle index
    "cdc_state",
    "shuffle_index",
    # r4v: FS waterfall explanation
    "match_explain",
    # r4x: RAG chunker, mixture sampler, SCD2 history, Ditto
    # serialization, IVF-PQ ADC search
    "chunk_overlap",
    "mix_sources",
    "scd2_history",
    "pair_serialize",
    "ivf_pq_topk",
    # r4y: k-anonymity audit, calendar densify, truncated-dim retrieval
    # eval, BFS depth diagnostics
    "k_anonymity",
    "dense_hourly",
    "dim_truncation_recall",
    "bfs_depth",
    # r4z: soft-dedup weights, mergeable quantile sketch, RAKE keyphrases
    "dedup_weights",
    "quantile_sketch",
    "rake_phrases",
    # r4aa: weakest-link cluster audit, cross-source dup matrix
    "weakest_link",
    "source_overlap",
    # r4ab: greedy k-center coreset
    "kcenter_coreset",
    # r4ac: progressive resolution curve
    "progressive_er",
    # r4ad: LTV decile lift, seasonal-naive baseline
    "decile_lift",
    "seasonal_naive",
    # r4ae: type co-occurrence, top principal component
    "type_cooccurrence",
    "top_component",
    # r4af: int8 quant audit, marker-reset running totals
    "int8_quant_audit",
    "reset_running_total",
    # r4ag: DQ expectations, activity-day gaps
    "dq_checks",
    "user_day_gaps",
    # r4ah: strict two-hop fringe + join-size estimation
    "two_hop_reach",
    "join_size_estimate",
    # r4ai: source vocabulary similarity + blocking-scheme table + KS
    "source_similarity",
    "blocking_compare",
    "ks_lengths",
    # r1-era queries with standing driver rows — added for rehearsal
    # completeness so EVERY registered query re-verifies at sf0.01
    "cosine_topk",
    "customers_per_region",
    "customers_without_events",
    "dedup_exact",
    "doc_stats",
    "embedding_neardup_pairs",
    "filter_revenue",
    "fingerprint",
    "hourly_user_activity",
    "orders_by_segment",
    "parts_with_orders",
    "pricing_summary",
    "term_match_first",
    "token_count",
    "top_orders",
    "top_orders_per_segment",
    "unigrams",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "orders", "customer",
              "events", "part", "region", "nation", "supplier"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(name, duck):
    qs, oq = entry.queries(), entry.oracle_sql()
    assert name in oq, f"{name} lost its oracle entry"
    res = qs[name](SF)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    odf = duck.execute(oq[name]).df()
    a, b = _normalize(rdf), _normalize(odf)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b)


def test_every_query_has_an_oracle():
    qs, oq = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(oq))
    assert not missing, f"queries without oracle entries: {missing}"
