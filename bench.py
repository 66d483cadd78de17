#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the headline pipeline in FRESH processes at two
parallelism levels N and 4N CPUs on the same input (the sandbox stand-in
for N- vs 4N-node clusters; default 4 vs 16 so neither leg saturates the
box — see run_scaling for the rationale, SCEL_SCALING_LO/HI to override)
and prints both throughputs plus the scaling efficiency; results are
recorded in BASELINE.md alongside the matching ``--calibrate`` ceiling.

This script OWNS its Ray session (init+shutdown); the library never does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # fixture generation + OS page-cache warmup happen OUTSIDE timed regions
    from snomed_ct_entity_linking_ray import fixtures

    fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))

    import ray

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from snomed_ct_entity_linking_ray.pipelines import (
        dedup,
        entity_link,
        relational,
        text,
        training,
        vectors,
    )

    # warm reads (untimed): one pass over the biggest inputs incl. the
    # fixture docs so both scaling legs measure compute, not cold disk
    relational.read(sf_dir, "lineitem", ["l_orderkey"]).count()
    relational.read(sf_dir, "documents", ["doc_id"]).count()
    import ray.data as _rd

    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    _rd.read_parquet(f"{fdir}/docs.parquet", columns=["doc_id"]).count()

    queries: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        ds = fn(sf_dir)
        n = ds.count() if isinstance(ds, ray.data.Dataset) else len(ds)
        queries[name] = round(time.time() - t0, 3)
        return n

    # headline: the flagship record-linkage pipeline end-to-end, with
    # per-stage instrumentation (no duplicate passes). Min-of-N reps
    # (default 2) per the BASELINE.md host-noise methodology — a single
    # sample on this host can read 2x off (±50% external noise).
    n_docs = fixtures.spec_for_sf_dir(sf_dir).n_docs
    reps = int(os.environ.get("SCEL_HEADLINE_REPS", "2"))
    headline, stage, n_linked, raw = float("inf"), {}, 0, []
    for _ in range(max(1, reps)):
        st: dict = {}
        t0 = time.time()
        n_linked = entity_link.run_entity_link(sf_dir, timings=st).count()
        dt = round(time.time() - t0, 3)
        raw.append(dt)
        if dt < headline:
            headline, stage = dt, st
    queries["entity_link"] = headline
    n_pairs = stage.get("n_candidate_pairs", 0)
    t_score = max(1e-9, stage.get("t_block_score", 0.0))
    queries["pair_scoring"] = round(t_score, 3)

    # scaling legs (SCEL_SCALING_LEG=1, set by run_scaling) measure the
    # headline only: the family ops would roughly double each leg's
    # wall-clock without contributing to the lo/hi ratio
    if not os.environ.get("SCEL_SCALING_LEG"):
        # operator-family representatives
        timed("pricing_summary", relational.q_pricing_summary)
        timed("hourly_user_activity", relational.q_hourly_user_activity)
        timed("sessionize", relational.q_sessionize)
        timed("unigrams", text.q_unigrams)
        timed("token_count", text.q_token_count)
        timed("minhash_lsh_pairs", dedup.q_minhash_lsh_pairs)
        timed("embedding_neardup_pairs", dedup.q_embedding_neardup_pairs)
        timed("cosine_topk", vectors.q_cosine_topk)
        timed("dedup_exact", dedup.q_dedup_exact)
        timed("winnow_dups", dedup.q_winnow_dups)
        timed("doc_freq", text.q_doc_freq)
        timed("approx_users", relational.q_approx_users)
        timed("bm25_topk", text.q_bm25_topk)
        timed("pack_sequences", training.q_pack_sequences)
        timed("decontaminate", training.q_decontaminate)
        # same op with the broadcast plan DISABLED so the 100-TB Bloom-filter
        # path (distributed OR-tree build + packed-bits probe) gets a measured
        # number next to the exact plan (VERDICT r3 #8)
        timed(
            "decontaminate_bloom",
            lambda d: training.q_decontaminate(d, max_broadcast=0),
        )
        timed("quality_score", training.q_quality_score)
        timed("novel_docs", training.q_novel_docs)
        from snomed_ct_entity_linking_ray.pipelines import multimodal

        timed("span_stats", multimodal.q_span_stats)
        # r4 additions: multi-join OLAP, lag window, scrub/filter/collocation,
        # and the prefix-filtered set-similarity join
        timed("shipping_priority", relational.q_shipping_priority)
        timed("local_supplier_volume", relational.q_local_supplier_volume)
        timed("event_gaps", relational.q_event_gaps)
        timed("redact_terms", text.q_redact_terms)
        timed("quality_filter", text.q_quality_filter)
        timed("bigram_lift", text.q_bigram_lift)
        timed("ngram_jaccard_pairs", dedup.q_ngram_jaccard_pairs)
        # r4b: ER blocking family + relational additions
        from snomed_ct_entity_linking_ray.pipelines import er

        timed("fuzzy_name_pairs", er.q_fuzzy_name_pairs)
        timed("sorted_neighborhood_pairs", er.q_sorted_neighborhood_pairs)
        timed("customer_order_distribution", relational.q_customer_order_distribution)
        timed("sliding_activity", relational.q_sliding_activity)
        timed("kmeans_clusters", vectors.q_kmeans_clusters)
        timed("order_event_window", relational.q_order_event_window)
        timed("posting_lists", text.q_posting_lists)
        timed("funnel_conversion", relational.q_funnel_conversion)
        # r4c: FS pattern histogram, survivorship, transitive clustering
        timed("match_patterns", er.q_match_patterns)
        timed("golden_user_profile", er.q_golden_user_profile)
        timed("name_clusters", er.q_name_clusters)
        # r4d: m/u estimation, blocking evaluation, meta-blocking pruning
        timed("match_weights", er.q_match_weights)
        timed("blocking_metrics", er.q_blocking_metrics)
        timed("metablocking_pairs", er.q_metablocking_pairs)
        timed("match_roc", er.q_match_roc)
        timed("small_qty_revenue", relational.q_small_qty_revenue)
        timed("market_share", relational.q_market_share)
        # r4e: TPC-H Q4/Q7/Q10/Q14/Q18/Q19/Q22, pivot/row_number windows,
        # mutual-best 1:1 matching + pair feature vectors
        timed("order_priority_count", relational.q_order_priority_count)
        timed("volume_shipping", relational.q_volume_shipping)
        timed("returned_items", relational.q_returned_items)
        timed("promo_revenue", relational.q_promo_revenue)
        timed("large_volume_customers", relational.q_large_volume_customers)
        timed("disjunctive_revenue", relational.q_disjunctive_revenue)
        timed("sales_opportunity", relational.q_sales_opportunity)
        timed("event_type_pivot", relational.q_event_type_pivot)
        timed("event_seq", relational.q_event_seq)
        timed("mutual_best_pairs", er.q_mutual_best_pairs)
        timed("pair_features", er.q_pair_features)
        timed("phonetic_pairs", er.q_phonetic_pairs)
        # r4f: cluster-quality eval, canopy blocking, incremental linkage
        timed("cluster_metrics", er.q_cluster_metrics)
        timed("canopy_pairs", er.q_canopy_pairs)
        timed("link_increment", er.q_link_increment)
        timed("match_classify", er.q_match_classify)
        timed("media_nearest", multimodal.q_media_nearest)
        timed("suffix_pairs", er.q_suffix_pairs)
        # r4h: Q15/Q21 shapes + Monge-Elkan token-set scoring
        timed("top_supplier", relational.q_top_supplier)
        timed("lone_return_supplier", relational.q_lone_return_supplier)
        timed("monge_elkan_pairs", er.q_monge_elkan_pairs)
        timed("cube_summary", relational.q_cube_summary)
        timed("exact_quantiles", relational.q_exact_quantiles)
        # r4i: Q12 shape, B-cubed eval, standardization, grouped mode,
        # lexical diversity, percentile-band filtering
        timed("shipmode_priority", relational.q_shipmode_priority)
        timed("bcubed_metrics", er.q_bcubed_metrics)
        timed("canonical_names", er.q_canonical_names)
        timed("user_modal_event", relational.q_user_modal_event)
        timed("token_diversity", text.q_token_diversity)
        timed("length_band_filter", text.q_length_band_filter)
        timed("length_cdf", text.q_length_cdf)
        # r4j: exact-distance neighbor joins, ARI, OOV, moments variance
        timed("edit_neighbors", er.q_edit_neighbors)
        timed("hamming_neighbors", er.q_hamming_neighbors)
        timed("ari_metric", er.q_ari_metric)
        timed("oov_rate", text.q_oov_rate)
        timed("grouped_variance", relational.q_grouped_variance)
        timed("knn_classify", vectors.q_knn_classify)
        timed("prefix_dups", dedup.q_prefix_dups)
        timed("user_event_path", relational.q_user_event_path)
        timed("priority_revenue_share", relational.q_priority_revenue_share)
        timed("freq_of_freqs", text.q_freq_of_freqs)
        timed("multipass_pairs", er.q_multipass_pairs)
        timed("substring_contamination", training.q_substring_contamination)
        timed("event_transitions", relational.q_event_transitions)
        timed("hourly_distinct_users", relational.q_hourly_distinct_users)
        timed("next_event_after_order", relational.q_next_event_after_order)
        # r4q: TF adjustment, unlinkables, cluster audit, rule cascade,
        # MAD outliers, range self-join, media-reel dedup
        timed("tf_adjustment", er.q_tf_adjustment)
        timed("unlinkables", er.q_unlinkables)
        timed("cluster_conflicts", er.q_cluster_conflicts)
        timed("rule_cascade", er.q_rule_cascade)
        timed("mad_outliers", relational.q_mad_outliers)
        timed("near_events", relational.q_near_events)
        timed("media_dup_docs", multimodal.q_media_dup_docs)
        timed("block_skew_report", er.q_block_skew_report)
        timed("cheapest_supplier", relational.q_cheapest_supplier)
        timed("cosine_range", vectors.q_cosine_range)
        timed("predicted_links", er.q_predicted_links)
        timed("threshold_stability", er.q_threshold_stability)
        timed("containment_pairs", dedup.q_containment_pairs)
        timed("knn_join", vectors.q_knn_join)
        timed("clustering_coefficient", er.q_clustering_coefficient)
        timed("fd_violations", relational.q_fd_violations)
        timed("wnp_pairs", er.q_wnp_pairs)
        timed("unsupported_edges", er.q_unsupported_edges)
        timed("winsorized_stats", relational.q_winsorized_stats)
        timed("media_dup_text_check", multimodal.q_media_dup_text_check)
        # r4r-r4u: truth discovery, group linkage, KwikCluster, segment
        # dedup, join discovery, BPE encode, hard negatives, executed
        # salting, KMV sketch, CDC apply, shuffle index
        timed("truth_discovery", er.q_truth_discovery)
        timed("group_linkage", er.q_group_linkage)
        timed("cc_pivot", er.q_cc_pivot)
        timed("segment_dedup", dedup.q_segment_dedup)
        timed("join_discovery", relational.q_join_discovery)
        timed("bpe_tokens", training.q_bpe_tokens)
        timed("hard_negatives", vectors.q_hard_negatives)
        timed("salted_pairs", er.q_salted_pairs)
        timed("kmv_users", relational.q_kmv_users)
        timed("cdc_state", relational.q_cdc_state)
        timed("shuffle_index", relational.q_shuffle_index)
        timed("match_explain", er.q_match_explain)
        # r4x: RAG chunker, mixture sampler, SCD2 history, Ditto pair
        # serialization, IVF-PQ ADC search
        timed("chunk_overlap", text.q_chunk_overlap)
        timed("mix_sources", text.q_mix_sources)
        timed("scd2_history", relational.q_scd2_history)
        timed("pair_serialize", er.q_pair_serialize)
        timed("ivf_pq_topk", vectors.q_ivf_pq_topk)
        # r4y: k-anonymity audit, calendar densify, truncated-dim eval,
        # BFS depth
        timed("k_anonymity", relational.q_k_anonymity)
        timed("dense_hourly", relational.q_dense_hourly)
        timed("dim_truncation_recall", vectors.q_dim_truncation_recall)
        timed("bfs_depth", er.q_bfs_depth)
        # r4z: soft-dedup weights, quantile sketch, RAKE keyphrases
        timed("dedup_weights", dedup.q_dedup_weights)
        timed("quantile_sketch", relational.q_quantile_sketch)
        timed("rake_phrases", text.q_rake_phrases)
        # r4aa: weakest-link audit, cross-source dup matrix
        timed("weakest_link", er.q_weakest_link)
        timed("source_overlap", dedup.q_source_overlap)
        timed("kcenter_coreset", vectors.q_kcenter_coreset)
        timed("progressive_er", er.q_progressive_er)
        timed("decile_lift", relational.q_decile_lift)
        timed("seasonal_naive", relational.q_seasonal_naive)
        timed("type_cooccurrence", relational.q_type_cooccurrence)
        timed("top_component", vectors.q_top_component)
        timed("int8_quant_audit", vectors.q_int8_quant_audit)
        timed("reset_running_total", relational.q_reset_running_total)
        timed("dq_checks", relational.q_dq_checks)
        timed("user_day_gaps", relational.q_user_day_gaps)
        timed("two_hop_reach", er.q_two_hop_reach)
        timed("join_size_estimate", relational.q_join_size_estimate)
        timed("source_similarity", text.q_source_similarity)
        timed("blocking_compare", er.q_blocking_compare)
        timed("ks_lengths", text.q_ks_lengths)

    result = {
        "metric": "entity_link_e2e",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "num_cpus": ncpu,
        "n_docs": n_docs,
        "n_linked": n_linked,
        "docs_per_sec": round(n_docs / headline, 1),
        "n_candidate_pairs": n_pairs,
        "pairs_per_sec": round(n_pairs / t_score, 1),
        "headline_reps": raw,  # min-of-N estimator; raw samples recorded
        "stages": stage,
    }
    ray.shutdown()
    return result


SCALING_DOCS = "1000000"  # compute-dominated input for the two-level run


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            SCEL_BENCH_DOCS=os.environ.get("SCEL_BENCH_DOCS", SCALING_DOCS),
            SCEL_SCALING_LEG="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            # Surface the child's stderr: a bare CalledProcessError hides
            # the actual failure (the round-4i 3M campaign aborted opaquely).
            raise RuntimeError(
                f"scaling leg num_cpus={ncpu} exited {proc.returncode}; "
                f"stderr tail:\n{proc.stderr[-4000:]}"
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # N vs 4N parallelism levels. DEFAULT 4 vs 16: both legs stay ≤ half
    # the 32-core box, so per-core resources (memory bandwidth, object
    # store) are comparable between legs — the faithful single-box
    # analogue of an N→4N-NODE cluster, where per-node conditions are
    # identical in both legs by construction. SCEL_SCALING_LO/HI=8/32
    # selects the box-saturating stand-in; BASELINE.md records BOTH
    # configurations with their same-window spin calibrations
    # (`--calibrate`) — the 8→32 ratio is capped ~0.83 by the box itself.
    lo = int(os.environ.get("SCEL_SCALING_LO", "4"))
    hi = int(os.environ.get("SCEL_SCALING_HI", "16"))
    # Best-of-2 per leg: the sandbox host carries an invisible external
    # load (load avg 14-16 with zero local processes) that hits the
    # 32-CPU leg hardest — identical-code scaling runs measured 0.596 and
    # 0.292 an hour apart, and one noisy leg even showed pairs/s FALLING
    # with more CPUs. min-of-N is the standard noisy-host estimator of
    # true capability; both legs get the same treatment.
    reps = int(os.environ.get("SCEL_SCALING_REPS", "2"))
    runs_lo = [run(lo) for _ in range(reps)]
    runs_hi = [run(hi) for _ in range(reps)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)  # 1.0 = linear scaling
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        # self-describing estimator (ADVICE r2): min-of-N per leg with the
        # rep count and every discarded raw timing recorded alongside
        "estimator": "min_per_leg",
        "reps": reps,
        "raw_sec_lo": [r["value"] for r in runs_lo],
        "raw_sec_hi": [r["value"] for r in runs_hi],
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "pairs_per_sec_lo": r_lo["pairs_per_sec"],
        "pairs_per_sec_hi": r_hi["pairs_per_sec"],
        "sf": r_hi["sf"],
    }


SPIN_N = 30_000_000


def _spin_quantum(_):
    t0 = time.time()
    x = 0
    for i in range(SPIN_N):
        x += i
    return time.time() - t0


def run_calibration() -> dict:
    """Host parallel-efficiency ceiling (the direct measurement behind the
    BASELINE.md scaling analysis): a Ray-free, communication-free, zero-I/O
    pure-python spin run at the lo and hi process counts. Any 8→32
    measurement on this box — pipeline or not — is bounded by the per-core
    slowdown this records (all-core frequency/hypervisor envelope), and a
    barrier-synced stage is gated by the straggler (max) quantum. On a
    real N→4N-NODE cluster both legs run all-cores-busy per node, so this
    per-core effect cancels; it exists only in the single-box core-count
    stand-in."""
    import multiprocessing as mp

    lo = int(os.environ.get("SCEL_SCALING_LO", "4"))
    hi = int(os.environ.get("SCEL_SCALING_HI", "16"))
    reps = int(os.environ.get("SCEL_SCALING_REPS", "2"))

    def level(n: int) -> dict:
        runs = []
        for _ in range(reps):
            with mp.Pool(n) as p:
                times = p.map(_spin_quantum, range(n))
            runs.append({"mean": sum(times) / len(times), "max": max(times)})
        best = min(runs, key=lambda r: r["mean"])
        return {"procs": n, "reps": runs, "mean": round(best["mean"], 3),
                "max": round(best["max"], 3)}

    r_lo, r_hi = level(lo), level(hi)
    return {
        "metric": "host_parallel_ceiling",
        "unit": "ratio",
        # per-core efficiency at hi vs lo width: 1.0 = no slowdown
        "value": round(r_lo["mean"] / r_hi["mean"], 3),
        "straggler_ceiling": round(r_lo["max"] / r_hi["max"], 3),
        "lo": r_lo,
        "hi": r_hi,
        "spin_n": SPIN_N,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--calibrate" in sys.argv:
        print(json.dumps(run_calibration()))
    else:
        print(json.dumps(run_bench()))
