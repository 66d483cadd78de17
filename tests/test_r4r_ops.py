"""Invariant tests for the r4r operator batch — properties the oracle
compare can't see (brute-force equivalence on the small fixture,
structural invariants of the outputs)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# --- truth_discovery ---------------------------------------------------------

def _claims(sf):
    import json

    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev = ev.sort_values(["ts", "event_id"]).drop_duplicates(
        subset=["user_id", "event_type"], keep="last"
    )

    def k_of(p):
        try:
            val = json.loads(p).get("k", 0)
        except Exception:
            return 0
        if isinstance(val, bool) or not isinstance(val, (int, float)):
            return 0
        return int(round(val))

    kv = np.array([k_of(p) for p in ev["props"]], dtype=np.int64)
    return pd.DataFrame(
        {
            "user_id": ev["user_id"].to_numpy(np.int64),
            "src": ev["event_type"].astype(str),
            # TRUNCATING division (the engine/oracle `//` contract)
            "v": np.sign(kv) * (np.abs(kv) // 10),
        }
    )


def test_truth_discovery_matches_sequential_two_rounds():
    """Distributed fusion == plain single-process two-round walk."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_truth_discovery

    res = q_truth_discovery(SF).to_pandas().sort_values("user_id")
    cl = _claims(SF)
    # round 1: majority, ties -> smallest bucket
    t1 = {}
    for uid, g in cl.groupby("user_id"):
        counts = g.groupby("v").size()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        t1[uid] = best
    # accuracy in floor micro-units
    wt = {}
    for src, g in cl.groupby("src"):
        num = sum(int(v == t1[u]) for u, v in zip(g["user_id"], g["v"]))
        wt[src] = num * 1_000_000 // len(g)
    rows = []
    for uid, g in cl.groupby("user_id"):
        agg = {}
        for src, v in zip(g["src"], g["v"]):
            w, n = agg.get(v, (0, 0))
            agg[v] = (w + wt[src], n + 1)
        v, (w, n) = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))[0]
        rows.append((uid, v, w, n))
    exp = pd.DataFrame(
        rows, columns=["user_id", "value_bin", "weight", "n_support"]
    ).sort_values("user_id")
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True).astype(np.int64),
        exp.reset_index(drop=True).astype(np.int64),
    )


def test_truth_discovery_one_row_per_object():
    from snomed_ct_entity_linking_ray.pipelines.er import q_truth_discovery

    res = q_truth_discovery(SF).to_pandas()
    assert res["user_id"].is_unique
    assert (res["weight"] >= 0).all() and (res["n_support"] >= 1).all()


# --- group_linkage -----------------------------------------------------------

def test_group_linkage_matches_bruteforce_jaccard():
    from snomed_ct_entity_linking_ray.pipelines.er import q_group_linkage

    res = q_group_linkage(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    cp = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    sets = {
        c: set(g["l_partkey"]) for c, g in cp.groupby("o_custkey")
    }
    df_count = cp.drop_duplicates(subset=["o_custkey", "l_partkey"])[
        "l_partkey"
    ].value_counts()
    hot = set(df_count[df_count > 256].index)
    expected = set()
    custs = sorted(sets)
    for i, a in enumerate(custs):
        for b in custs[i + 1:]:
            inter = {p for p in sets[a] & sets[b] if p not in hot}
            union = len(sets[a]) + len(sets[b]) - len(inter)
            if inter and 10 * len(inter) >= union:
                expected.add((a, b, len(inter), union))
    got = set(
        zip(res["c_a"].astype(int), res["c_b"].astype(int),
            res["n_inter"].astype(int), res["n_union"].astype(int))
    )
    assert got == expected


def test_group_linkage_canonical_and_bounded():
    from snomed_ct_entity_linking_ray.pipelines.er import q_group_linkage

    res = q_group_linkage(SF).to_pandas()
    assert (res["c_a"] < res["c_b"]).all()
    assert (res["n_inter"] <= res["n_union"]).all()
    assert not res.duplicated(subset=["c_a", "c_b"]).any()


# --- cc_pivot ----------------------------------------------------------------

def _fuzzy_edges(names, threshold=0.8):
    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler

    adj = {m: [] for m in names}
    for i, x in enumerate(names):
        for y in names[i + 1:]:
            if x[:1] == y[:1] and abs(len(x) - len(y)) <= 3:
                if jaro_winkler(x, y) >= threshold:
                    adj[x].append(y)
                    adj[y].append(x)
    return adj


def test_cc_pivot_matches_sequential_kwikcluster():
    from snomed_ct_entity_linking_ray.pipelines.er import q_cc_pivot

    res = q_cc_pivot(SF).to_pandas()
    names = sorted(set(
        pd.read_parquet(f"{SF}/part.parquet", columns=["p_name"])["p_name"]
    ))
    adj = _fuzzy_edges(names)
    rep = {}
    for v in names:
        if v in rep:
            continue
        rep[v] = v
        for u in adj[v]:
            if u not in rep:
                rep[u] = v
    got = dict(zip(res["p_name"], res["cluster_rep"]))
    assert got == rep


def test_cc_pivot_pivots_are_independent_and_direct():
    """Correlation-clustering structure: reps form an independent set in
    the match graph, and every member is a DIRECT neighbor of its rep
    (no transitive chaining — the contrast with q_name_clusters)."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_cc_pivot

    res = q_cc_pivot(SF).to_pandas()
    names = list(res["p_name"])
    adj = _fuzzy_edges(names)
    reps = set(res["cluster_rep"])
    for r in reps:
        assert not any(nb in reps for nb in adj[r])
    for nm, r in zip(res["p_name"], res["cluster_rep"]):
        assert nm == r or nm in adj[r]


# --- segment_dedup -----------------------------------------------------------

def _segments(text, k=20):
    words = str(text).split(" ")
    n = (len(words) + k - 1) // k
    return [" ".join(words[j * k:(j + 1) * k]) for j in range(n)]


def test_segment_dedup_matches_bruteforce():
    from snomed_ct_entity_linking_ray.pipelines.dedup import q_segment_dedup

    res = q_segment_dedup(SF).to_pandas().sort_values("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    seen = set()
    exp_rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        segs = _segments(text)
        removed = 0
        for s in segs:
            if s in seen:
                removed += 1
            else:
                seen.add(s)
        exp_rows.append((int(did), len(segs), removed))
    exp = pd.DataFrame(exp_rows,
                       columns=["doc_id", "n_segments", "n_removed"])
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True).astype(np.int64),
        exp.astype(np.int64),
    )


def test_segment_dedup_totals():
    """Total keepers = distinct segment texts in the corpus."""
    from snomed_ct_entity_linking_ray.pipelines.dedup import q_segment_dedup

    res = q_segment_dedup(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    all_segs = [s for t in docs["text"] for s in _segments(t)]
    assert res["n_segments"].sum() == len(all_segs)
    assert (res["n_segments"].sum() - res["n_removed"].sum()
            == len(set(all_segs)))
