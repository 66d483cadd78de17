"""Invariant tests for the r4s operator batch (join discovery, BPE
encode, hard-negative mining) — brute-force equivalence and structural
properties the oracle compare can't see."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# --- join_discovery ----------------------------------------------------------

def test_join_discovery_matches_bruteforce_containment():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        JOINDISC_COLS,
        q_join_discovery,
    )

    res = q_join_discovery(SF).to_pandas()
    sets = {}
    for t, c in JOINDISC_COLS:
        vals = pd.read_parquet(f"{SF}/{t}.parquet", columns=[c])[c]
        sets[f"{t}.{c}"] = set(int(v) for v in vals)
    expected = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter and 2 * inter >= len(sa):
                expected.add((a, b, len(sa), inter))
    got = set(
        zip(res["col_a"], res["col_b"],
            res["n_a"].astype(int), res["n_inter"].astype(int))
    )
    assert got == expected


def test_join_discovery_finds_declared_fks():
    """The declared FK edges of the schema must surface with full
    containment (the discovery sanity check)."""
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_join_discovery,
    )

    res = q_join_discovery(SF).to_pandas()
    full = {
        (r.col_a, r.col_b) for r in res.itertuples()
        if r.n_inter == r.n_a
    }
    for fk, pk in [
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("nation.n_regionkey", "region.r_regionkey"),
    ]:
        assert (fk, pk) in full, (fk, pk)


# --- bpe_tokens --------------------------------------------------------------

def test_bpe_tokens_bounds_and_no_merge_identity():
    """Tokens per word lie in [1, len(word)]; with zero merges the token
    count equals the character count of every word."""
    from snomed_ct_entity_linking_ray.pipelines.training import (
        bpe_encode_len,
        q_bpe_merges,
        q_bpe_tokens,
    )

    res = q_bpe_tokens(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    nw = {int(d): len(str(t).split(" "))
          for d, t in zip(docs["doc_id"], docs["text"])}
    for r in res.itertuples():
        assert r.n_words == nw[r.doc_id]
        assert r.n_words <= r.n_tokens
    assert bpe_encode_len("table", {}) == 5
    merges = q_bpe_merges(SF).to_pandas()
    # the learned merges must compress the corpus strictly below the
    # zero-merge ceiling (sum of word character counts)
    if len(merges):
        ceiling = sum(
            sum(len(w) for w in str(t).split(" ")) for t in docs["text"]
        )
        assert res["n_tokens"].sum() < ceiling


def test_bpe_encode_len_overlap_and_priority():
    """Apply-walk disambiguation: lowest rank wins over textual order,
    overlapping occurrences merge left-to-right."""
    from snomed_ct_entity_linking_ray.pipelines.training import (
        bpe_encode_len,
    )

    # rank 0 = (b, c) beats earlier-in-word (a, b) at rank 1
    assert bpe_encode_len("abc", {("a", "b"): 1, ("b", "c"): 0}) == 2
    # overlapping (a, a): left-to-right pass -> (aa)(aa)a = 3 tokens
    assert bpe_encode_len("aaaaa", {("a", "a"): 0}) == 3
    # after the pass, (aa,aa) may merge if learned
    assert bpe_encode_len("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == 1


# --- hard_negatives ----------------------------------------------------------

def test_hard_negatives_label_disjoint_and_ranked():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        q_hard_negatives,
    )

    res = q_hard_negatives(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "label"])
    lab = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    assert (res["vec_id"] != res["neg_id"]).all()
    for r in res.itertuples():
        assert lab[int(r.vec_id)] != lab[int(r.neg_id)]
    counts = res.groupby("vec_id")["rank"].agg(["min", "max", "count"])
    assert (counts["min"] == 1).all()
    assert (counts["max"] == counts["count"]).all()


def test_hard_negatives_matches_bruteforce_quantized():
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        RANGE_QUANT,
        q_hard_negatives,
    )

    k = 3
    res = q_hard_negatives(SF, k=k).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    Ei = np.rint(E * RANGE_QUANT).astype(np.int64)
    ids = emb["vec_id"].to_numpy(np.int64)
    lab = emb["label"].to_numpy(np.int64)
    expected = []
    for i in range(len(ids)):
        sims = sorted(
            (-(int(Ei[i] @ Ei[j])), int(ids[j]))
            for j in range(len(ids))
            if j != i and lab[j] != lab[i]
        )
        for r, (_, nn) in enumerate(sims[:k], start=1):
            expected.append((int(ids[i]), nn, r))
    got = list(
        res.sort_values(["vec_id", "rank"])[["vec_id", "neg_id", "rank"]]
        .astype(int).itertuples(index=False, name=None)
    )
    assert got == expected  # both ordered by (vec_id asc, rank asc)
