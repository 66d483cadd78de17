"""Invariant tests for the r4y operator batch: k-anonymity audit,
calendar-spine densified hourly series, dimension-truncation retrieval
eval, BFS depth diagnostics. (Oracle parity pinned in
test_oracle_parity.py.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_k_anonymity_matches_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        K_ANON,
        q_k_anonymity,
    )

    out = q_k_anonymity(SF).to_pandas()
    assert (out["n"] < K_ANON).all()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_mktsegment", "c_acctbal"]).to_pandas()
    cents = np.rint(cust["c_acctbal"].to_numpy(np.float64) * 100).astype(np.int64)
    cust["bal_band"] = (cents + 100000) // 100000
    g = cust.groupby(["c_mktsegment", "bal_band"]).size().reset_index(name="n")
    expect = g[g["n"] < K_ANON]
    a = out.sort_values(["c_mktsegment", "bal_band"]).reset_index(drop=True)
    b = expect.sort_values(["c_mktsegment", "bal_band"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


def test_dense_hourly_spine_is_complete_and_mass_preserving():
    from snomed_ct_entity_linking_ray.pipelines.relational import q_dense_hourly

    out = q_dense_hourly(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    types = set(ev["event_type"])
    hours = ev["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
    span = int(hours.max() - hours.min() + 1)
    # complete grid: every (hour, type) cell exactly once
    assert len(out) == span * len(types)
    assert not out.duplicated(["hour", "event_type"]).any()
    assert int(out["n"].sum()) == len(ev)
    # densify actually manufactured zero rows
    assert (out["n"] == 0).any()
    per_hour = out.groupby("event_type")["hour"].nunique()
    assert (per_hour == span).all()


def test_dim_truncation_recall_bounds_and_brute_force():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        N_QUERIES,
        TRUNC_DIMS,
        q_dim_truncation_recall,
    )

    k = 5
    out = q_dim_truncation_recall(SF, k=k).to_pandas()
    assert len(out) == N_QUERIES
    assert out["n_common"].between(0, k).all()

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy(np.int64)
    isq = ids < N_QUERIES

    def topk(M):
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        Q, C = Mn[isq], Mn[~isq]
        cids = ids[~isq]
        sims = Q @ C.T
        got = []
        for r in range(len(Q)):
            order = np.lexsort((cids, -sims[r]))[:k]
            got.append(set(int(cids[j]) for j in order))
        return got

    full, trunc = topk(E), topk(E[:, :TRUNC_DIMS])
    expect = {int(q): len(f & t)
              for q, f, t in zip(ids[isq], full, trunc)}
    got = dict(zip(out["query_id"].astype(int), out["n_common"].astype(int)))
    assert got == expect


def test_bfs_depth_consistent_with_name_clusters():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_bfs_depth,
        q_name_clusters,
    )

    out = q_bfs_depth(SF).to_pandas()
    # root is the canonical (lexicographically smallest) member
    assert (out["root"] <= out["p_name"]).all()
    z = out["depth"] == 0
    assert (out.loc[z, "p_name"] == out.loc[z, "root"]).all()
    assert (out.loc[~z, "p_name"] != out.loc[~z, "root"]).all()
    # same partition as the connected-components pipeline
    nc = q_name_clusters(SF).to_pandas()
    m = out.merge(nc, on="p_name")
    assert len(m) == len(out)
    assert (m["root"] == m["cluster_rep"]).all()
