"""Invariant tests for the r4aa operator batch: weakest-link cluster
audit and cross-source near-dup overlap matrix."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_weakest_link_is_min_edge_of_its_cluster():
    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_fuzzy_name_pairs,
        q_name_clusters,
        q_weakest_link,
    )

    out = q_weakest_link(SF).to_pandas()
    nc = q_name_clusters(SF).to_pandas()
    rep_of = dict(zip(nc["p_name"], nc["cluster_rep"]))
    pairs = q_fuzzy_name_pairs(SF, block_cap=1 << 62).to_pandas()
    pairs["rep"] = pairs["name_a"].map(rep_of)
    pairs["jw_micro"] = [
        int(np.floor(jaro_winkler(a, b) * 1_000_000))
        for a, b in zip(pairs["name_a"], pairs["name_b"])
    ]
    # both endpoints agree on the cluster (edges never cross clusters)
    assert (pairs["name_b"].map(rep_of) == pairs["rep"]).all()
    # exactly one row per cluster-with-an-edge, and it is the min edge
    assert set(out["cluster_rep"]) == set(pairs["rep"])
    assert out["cluster_rep"].is_unique
    for _, r in out.iterrows():
        g = pairs[pairs["rep"] == r["cluster_rep"]]
        best = g.sort_values(["jw_micro", "name_a", "name_b"]).iloc[0]
        assert (r["name_a"], r["name_b"], r["jw_micro"]) == (
            best["name_a"], best["name_b"], best["jw_micro"])


def test_source_overlap_counts_every_pair_once():
    from snomed_ct_entity_linking_ray.pipelines.dedup import (
        q_minhash_lsh_pairs,
        q_source_overlap,
    )

    out = q_source_overlap(SF).to_pandas()
    pairs = q_minhash_lsh_pairs(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    src = dict(zip(docs["doc_id"].astype(int), docs["source"]))
    assert int(out["n_pairs"].sum()) == len(pairs)
    assert (out["source_a"] <= out["source_b"]).all()
    # brute-force the matrix
    cells: dict = {}
    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        key = tuple(sorted((src[a], src[b])))
        cells[key] = cells.get(key, 0) + 1
    got = {(r["source_a"], r["source_b"]): int(r["n_pairs"])
           for _, r in out.iterrows()}
    assert got == cells


def test_kcenter_coreset_farthest_point_invariants():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        KMEANS_SCALE,
        q_kcenter_coreset,
    )

    out = q_kcenter_coreset(SF).to_pandas().sort_values("pick_order")
    assert out["vec_id"].is_unique
    assert out["pick_order"].tolist() == list(range(len(out)))
    assert int(out["min_dist"].iloc[0]) == 0  # seed
    # brute-force replay: each pick is the exact argmax of min-distance
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(np.int64)
    V = np.round(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * KMEANS_SCALE
    ).astype(np.int64)
    md = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    chosen = [0]
    for step in range(1, len(out)):
        diff = V - V[chosen[-1]]
        md = np.minimum(md, np.einsum("nd,nd->n", diff, diff))
        live = np.ones(len(ids), dtype=bool)
        live[chosen] = False
        j = np.lexsort((ids[live], -md[live]))[0]
        pick = int(ids[live][j])
        assert pick == int(out["vec_id"].iloc[step])
        assert int(md[live][j]) == int(out["min_dist"].iloc[step])
        chosen.append(int(np.searchsorted(ids, pick)))


def test_progressive_er_curve_monotone_and_ends_at_components():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_name_clusters,
        q_progressive_er,
    )

    out = q_progressive_er(SF).to_pandas().sort_values("budget")
    assert (out["budget"].diff().dropna() > 0).all()
    assert (out["n_merges"].diff().dropna() >= 0).all()
    assert (out["n_clusters"].diff().dropna() <= 0).all()
    nc = q_name_clusters(SF).to_pandas()
    # the curve's final point equals the full transitive clustering
    final_clusters = nc["cluster_rep"].nunique()
    assert int(out["n_clusters"].iloc[-1]) == final_clusters
    assert (out["n_clusters"] + out["n_merges"] == len(nc)).all()


def test_decile_lift_ntile_partition():
    from snomed_ct_entity_linking_ray.pipelines.relational import q_decile_lift

    out = q_decile_lift(SF).to_pandas().sort_values("decile")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "value"]).to_pandas()
    ev["cents"] = np.rint(ev["value"].to_numpy(np.float64) * 100).astype(np.int64)
    totals = ev.groupby("user_id")["cents"].sum()
    n = len(totals)
    assert int(out["n_users"].sum()) == n
    assert int(out["total_cents"].sum()) == int(totals.sum())
    # ntile sizes: first n%10 deciles take the extra member
    q, r = divmod(n, 10)
    expect_sizes = [q + 1] * r + [q] * (10 - r)
    assert out["n_users"].tolist() == [s for s in expect_sizes if s > 0]
    # deciles are value-ordered: per-user mean is non-increasing
    mean = out["total_cents"] / out["n_users"]
    assert (np.diff(mean.to_numpy()) <= 0).all()


def test_seasonal_naive_error_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_dense_hourly,
        q_seasonal_naive,
    )

    out = q_seasonal_naive(SF).to_pandas()
    spine = q_dense_hourly(SF).to_pandas()
    for _, r in out.iterrows():
        g = spine[spine["event_type"] == r["event_type"]].sort_values("hour")
        n = g["n"].to_numpy(np.int64)
        err = np.abs(n[24:] - n[:-24])
        assert int(r["n_forecasts"]) == len(err)
        assert int(r["abs_err_sum"]) == int(err.sum())


def test_type_cooccurrence_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_type_cooccurrence,
    )

    out = q_type_cooccurrence(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    sets = ev.groupby("user_id")["event_type"].agg(set)
    got = {(r["type_a"], r["type_b"]): int(r["n_users"])
           for _, r in out.iterrows()}
    types = sorted(ev["event_type"].unique())
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            n = int(sum(1 for s in sets if a in s and b in s))
            assert got.get((a, b), 0) == n
    assert (out["type_a"] < out["type_b"]).all()


def test_top_component_is_dominant_direction():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        KMEANS_SCALE,
        q_top_component,
    )

    out = q_top_component(SF).to_pandas().sort_values("dim")
    v = out["loading_micro"].to_numpy(np.float64) / 1e6
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3  # unit vector
    # Rayleigh quotient of the reported component is within 1e-6 of the
    # true top eigenvalue of the same integer covariance matrix
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"]).to_pandas()
    V = np.round(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * KMEANS_SCALE
    ).astype(np.int64)
    n = len(V)
    C = (n * (V.T @ V) - np.outer(V.sum(0), V.sum(0))).astype(np.float64)
    lam_v = v @ C @ v
    lam_max = np.linalg.eigvalsh(C)[-1]
    assert lam_v >= 0.999999 * lam_max


def test_reset_running_total_replay():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_reset_running_total,
    )

    out = q_reset_running_total(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(out) == len(ev)
    got = dict(zip(out["event_id"].astype(int), out["run_cents"].astype(int)))
    ev["cents"] = np.rint(ev["value"].to_numpy(np.float64) * 100).astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        run = 0
        for _, r in g.iterrows():
            if r["event_type"] == "error":
                run = 0  # marker opens a new segment, itself included
            run += int(r["cents"])
            assert got[int(r["event_id"])] == run


def test_int8_quant_audit_error_bound():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        q_int8_quant_audit,
    )

    out = q_int8_quant_audit(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"]).to_pandas()
    n = len(emb)
    assert (out["hi_q"] >= out["lo_q"]).all()
    # per-value reconstruction error < 2 quantization steps -> bound SSE
    rng = (out["hi_q"] - out["lo_q"]).to_numpy(np.int64)
    step = rng // 255 + 1
    assert (out["sse"].to_numpy(np.int64) <= n * (2 * step) ** 2).all()
    assert (out["sse"] >= 0).all()


def test_user_day_gaps_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_user_day_gaps,
    )

    out = q_user_day_gaps(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = (ev["ts"].astype("datetime64[us]").astype("int64")
                 // 86_400_000_000)
    expect = set()
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g["day"].astype(int)))
        for a, b in zip(days, days[1:]):
            if b > a + 1:
                expect.add((int(uid), a + 1, b - 1))
    got = set(zip(out["user_id"].astype(int), out["gap_start"].astype(int),
                  out["gap_end"].astype(int)))
    assert got == expect
    assert (out["gap_end"] >= out["gap_start"]).all()


def test_dq_checks_rules_and_counts():
    from snomed_ct_entity_linking_ray.pipelines.relational import q_dq_checks

    out = q_dq_checks(SF).to_pandas()
    assert len(out) == 4
    assert (out["n_violations"] >= 0).all()
    assert (out["n_violations"] <= out["n_checked"]).all()
    byrule = dict(zip(out["rule"], out["n_checked"]))
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
    assert byrule["events_value_nonnull"] == len(ev)


def test_two_hop_reach_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_fuzzy_name_pairs,
        q_two_hop_reach,
    )

    out = q_two_hop_reach(SF).to_pandas()
    pairs = q_fuzzy_name_pairs(SF, block_cap=1 << 62).to_pandas()
    adj: dict = {}
    for a, b in zip(pairs["name_a"], pairs["name_b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = dict(zip(out["p_name"], out["n_two_hop"].astype(int)))
    for node, nbrs in adj.items():
        two = set()
        for nb in nbrs:
            two |= adj[nb]
        strict = two - nbrs - {node}
        if strict:
            assert got.get(node) == len(strict), node
        else:
            assert node not in got
    # no nodes outside the adjacency ever appear
    assert set(got) <= set(adj)


def test_join_size_estimate_equals_actual_join():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_join_size_estimate,
    )

    out = q_join_size_estimate(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey"]).to_pandas()
    actual = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    assert int(out["join_size"].iloc[0]) == len(actual)
    assert int(out["n_left_keys"].iloc[0]) == orders["o_orderkey"].nunique()
    assert int(out["n_right_keys"].iloc[0]) == li["l_orderkey"].nunique()


def test_source_similarity_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.text import (
        q_source_similarity,
    )

    out = q_source_similarity(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    from collections import Counter
    hist: dict = {}
    for src, g in docs.groupby("source"):
        c: Counter = Counter()
        for t in g["text"]:
            c.update(w for w in str(t).split() if w)
        hist[src] = c
    srcs = sorted(hist)
    got = {(r["source_a"], r["source_b"]): int(r["intersection"])
           for _, r in out.iterrows()}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = sum(min(hist[a][w], hist[b][w]) for w in hist[a])
            assert got.get((a, b), 0) == inter
    # symmetry bound: intersection <= min(total mass)
    totals = {s: sum(hist[s].values()) for s in srcs}
    for (a, b), v in got.items():
        assert v <= min(totals[a], totals[b])


def test_blocking_compare_invariants():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        BLOCKING_SCHEMES,
        q_blocking_compare,
        q_blocking_metrics,
    )

    out = q_blocking_compare(SF).to_pandas()
    assert list(out["scheme"]) == [n for n, _ in BLOCKING_SCHEMES]
    assert (out["true_blocked_pairs"] <= out["blocked_pairs"]).all()
    assert out["rr_micro"].between(0, 1_000_000).all()
    assert out["pc_micro"].between(0, 1_000_000).all()
    # finer schemes block no more pairs than their coarser prefix scheme
    by = dict(zip(out["scheme"], out["blocked_pairs"].astype(int)))
    assert by["ch_brand"] <= by["ch"]
    assert by["brand_size"] <= by["size"]
    # the production (ch, brand) row agrees with q_blocking_metrics
    bm = q_blocking_metrics(SF).to_pandas().iloc[0]
    row = out[out["scheme"] == "ch_brand"].iloc[0]
    assert int(row["blocked_pairs"]) == int(bm["blocked_pairs"])
    assert int(row["true_blocked_pairs"]) == int(bm["true_blocked_pairs"])


def test_ks_lengths_scipy_free_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.text import q_ks_lengths

    out = q_ks_lengths(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "n_chars"]).to_pandas()
    srcs = sorted(docs["source"].unique())
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    got = {(r["source_a"], r["source_b"]): (int(r["ks_num"]), int(r["denom"]))
           for _, r in out.iterrows()}
    import numpy as _np
    for i, a in enumerate(srcs):
        la = _np.sort(docs.loc[docs["source"] == a, "n_chars"].to_numpy())
        for b in srcs[i + 1:]:
            lb = _np.sort(docs.loc[docs["source"] == b, "n_chars"].to_numpy())
            xs = _np.unique(_np.concatenate([la, lb]))
            ca = _np.searchsorted(la, xs, side="right")
            cb = _np.searchsorted(lb, xs, side="right")
            ks = int(_np.abs(ca * len(lb) - cb * len(la)).max())
            assert got[(a, b)] == (ks, len(la) * len(lb))
            # KS in [0, 1]
            assert 0 <= ks <= len(la) * len(lb)
