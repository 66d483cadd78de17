"""Invariant tests for the later r4q batches (containment, kNN join, WNP
pruning, winsorization, cross-modal verification)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_containment_pairs_bruteforce():
    """Distributed inverted-list containment must equal the direct
    per-pair set computation."""
    from snomed_ct_entity_linking_ray.pipelines.dedup import (
        CONTAIN_NGRAM,
        q_containment_pairs,
    )

    res = q_containment_pairs(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    sh = {}
    for r in docs.itertuples(index=False):
        ws = r.text.split(" ")
        sh[r.doc_id] = {
            " ".join(ws[i:i + CONTAIN_NGRAM])
            for i in range(len(ws) - CONTAIN_NGRAM + 1)
        }
    expected = set()
    ids = list(sh)
    for a in ids:
        if not sh[a]:
            continue
        for b in ids:
            if a == b:
                continue
            inter = len(sh[a] & sh[b])
            if inter and 2 * inter >= len(sh[a]):
                expected.add((a, b, inter, len(sh[a])))
    got = set(zip(res.doc_a.astype(int), res.doc_b.astype(int),
                  res.n_shared.astype(int), res.size_a.astype(int)))
    assert got == expected


def test_knn_join_rank1_is_argmax():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        RANGE_QUANT,
        q_knn_join,
    )

    res = q_knn_join(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    Ei = np.rint(E * RANGE_QUANT).astype(np.int64)
    vid = emb["vec_id"].to_numpy(np.int64)
    order = np.argsort(vid)
    vid, Ei = vid[order], Ei[order]
    sims = Ei @ Ei.T
    np.fill_diagonal(sims, -(1 << 62))
    r1 = res[res["rank"] == 1].set_index("vec_id")["nn_id"]
    for i, v in enumerate(vid):
        best = sims[i].max()
        best_ids = vid[sims[i] == best]
        assert r1.loc[v] == best_ids.min()
    # every vector has exactly k rows with ranks 1..k
    k = res["rank"].max()
    per = res.groupby("vec_id")["rank"].agg(["count", "min", "max"])
    assert (per["count"] == k).all() and (per["min"] == 1).all()


def test_wnp_prunes_by_endpoint_means():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_metablocking_pairs,
        q_wnp_pairs,
    )

    cand = q_metablocking_pairs(SF).to_pandas()
    kept = q_wnp_pairs(SF).to_pandas()
    sw: dict = {}
    d: dict = {}
    for r in cand.itertuples(index=False):
        for pk in (r.pk_a, r.pk_b):
            sw[pk] = sw.get(pk, 0) + r.n_shared
            d[pk] = d.get(pk, 0) + 1
    kept_set = set(zip(kept.pk_a.astype(int), kept.pk_b.astype(int)))
    for r in cand.itertuples(index=False):
        clears = (r.n_shared * d[r.pk_a] >= sw[r.pk_a]
                  or r.n_shared * d[r.pk_b] >= sw[r.pk_b])
        assert ((int(r.pk_a), int(r.pk_b)) in kept_set) == clears
    assert len(kept) == len(kept_set)


def test_winsorized_bounds():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_winsorized_stats,
    )

    res = q_winsorized_stats(SF).to_pandas()
    assert (res["lo_cents"] <= res["hi_cents"]).all()
    # clipped sum must sit within [n*lo, n*hi]
    assert (res["sum_clipped"] >= res["n"] * res["lo_cents"]).all()
    assert (res["sum_clipped"] <= res["n"] * res["hi_cents"]).all()


def test_block_skew_report_consistency():
    from snomed_ct_entity_linking_ray.pipelines.er import q_block_skew_report

    res = q_block_skew_report(SF).to_pandas()
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_name"])
    assert int(res["n_records"].sum()) == len(part)
    n = res["n_records"].to_numpy(np.int64)
    assert (res["n_pairs"].to_numpy(np.int64) == n * (n - 1) // 2).all()
    assert (res["n_salts"] >= 1).all()
    # a salted key's per-shard pair budget is respected
    assert (res["n_pairs"] <= res["n_salts"] * 65536).all()


def test_media_dup_text_check_subset_of_dup_members():
    from snomed_ct_entity_linking_ray.pipelines.multimodal import (
        q_media_dup_docs,
        q_media_dup_text_check,
    )

    dups = q_media_dup_docs(SF).to_pandas()
    chk = q_media_dup_text_check(SF).to_pandas()
    members = set(zip(dups.doc_id, dups.keeper))
    for r in chk.itertuples(index=False):
        assert (r.doc_id, r.keeper) in members and r.doc_id != r.keeper
        assert 0 <= r.jacc_micro <= 1_000_000
        assert r.consistent == int(r.jacc_micro >= 500_000)
    # exactly the non-keeper members are verified
    n_nonkeeper = int((dups.doc_id != dups.keeper).sum())
    assert len(chk) == n_nonkeeper
