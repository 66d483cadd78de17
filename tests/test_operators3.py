"""Tests for BIO decode (M15), graph ops (S5), keep-length clean (M13),
term locator (M24), blacklist filter (M19), remove/add lists (M26),
prediction merge (D1), artifact save/load (S8)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from snomed_ct_entity_linking_ray.functions.bio import decode_bio, fix_spans
from snomed_ct_entity_linking_ray.functions.text import keep_length_clean, locate_term
from snomed_ct_entity_linking_ray.stages import graph, postprocess
from snomed_ct_entity_linking_ray.state.artifacts import load_state, save_state


def test_decode_bio_m15():
    # tokens: "severe chest pain today" — B-1 I-1 I-1 O
    offsets = [(0, 6), (7, 12), (13, 17), (18, 23)]
    spans = decode_bio(offsets, [1, 2, 2, 0])
    assert spans == [(0, 17, 1)]
    # gap > max_gap breaks the span
    offsets2 = [(0, 6), (10, 14)]
    assert decode_bio(offsets2, [1, 2], max_gap=2) == [(0, 6, 1), (10, 14, 1)]
    # B after B starts a new entity
    assert decode_bio(offsets, [1, 1, 0, 3]) == [(0, 6, 1), (7, 12, 1), (18, 23, 2)]


def test_fix_spans_m15():
    text = "  pain  "
    assert fix_spans(text, [(0, 8, 1)]) == [(2, 6, 1)]
    assert fix_spans("   ", [(0, 3, 1)]) == []


def test_keep_length_clean_m13():
    s = "A1-b c.d, e:f!"
    out = keep_length_clean(s)
    assert len(out) == len(s)
    assert out == "A  b c.d, e:f "


def test_locate_term_m24():
    text = "chest pain and chest-pain but chestpainx"
    hits = locate_term(text, "chest pain")
    assert [(s, e) for s, e in hits] == [(0, 10), (15, 25)]


def test_graph_descendants_s5():
    rel = rd.from_pandas(
        pd.DataFrame(
            {
                "sourceId": [2, 3, 4, 5, 6],
                "destinationId": [1, 1, 2, 4, 99],
                "typeId": [graph.IS_A] * 4 + [123],
                "active": [1, 1, 1, 1, 1],
            }
        )
    )
    edges = graph.edges_from_relationship_rows(rel)
    csr = graph.build_csr(edges)
    assert graph.descendants(csr, 1) == {2, 3, 4, 5}
    assert graph.descendants(csr, 4) == {5}
    ds = rd.from_pandas(pd.DataFrame({"concept_id": [2, 5, 6, 1]}))
    tagged = graph.tag_descendants(ds, "concept_id", csr, 1).to_pandas()
    got = dict(zip(tagged["concept_id"], tagged["is_descendant"]))
    assert got == {2: True, 5: True, 6: False, 1: False}


def test_filter_blacklist_m19():
    m = rd.from_pandas(
        pd.DataFrame(
            {"surface": ["pain", "the", "ab", "cardoss"], "doc_id": ["d"] * 4}
        )
    )
    out = postprocess.filter_blacklist(m).to_pandas()
    assert sorted(out["surface"]) == ["cardoss", "pain"]


def test_remove_add_lists_m26():
    m = rd.from_pandas(
        pd.DataFrame({"surface": ["pain", "cardoss"], "doc_id": ["d", "d"]})
    )
    out = postprocess.apply_remove_list(m, ["Pain!"]).to_pandas()
    assert out["surface"].tolist() == ["cardoss"]

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": ["d1"], "text": ["noted chest pain here"]})
    )
    added = postprocess.apply_add_list(docs, [("chest pain", 77)]).to_pandas()
    assert len(added) == 1
    r = added.iloc[0]
    assert (r["start"], r["end"], r["concept_id"]) == (6, 16, 77)


def test_merge_predictions_d1():
    a = rd.from_pandas(
        pd.DataFrame({"doc_id": ["d"], "start": [0], "end": [10], "concept_id": [1]})
    )
    b = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": ["d", "d"], "start": [5, 20], "end": [8, 25],
             "concept_id": [2, 3]}
        )
    )
    out = postprocess.merge_predictions(a, b).to_pandas().sort_values("start")
    # longer span (0,10) beats contained (5,8); (20,25) survives
    assert [(r.start, r.end) for r in out.itertuples()] == [(0, 10), (20, 25)]


def test_artifacts_s8(tmp_path):
    import numpy as np

    state = {"surfaces": ["a", "b"], "emb": np.eye(2)}
    p = str(tmp_path / "link_state.pkl")
    save_state(state, p)
    back = load_state(p)
    assert back["surfaces"] == ["a", "b"]
    np.testing.assert_array_equal(back["emb"], state["emb"])
    assert load_state(str(tmp_path / "missing.pkl")) is None


def test_dedup_block_cap_skew():
    """Skew discipline under prefix-filter blocking: an over-cap
    (lang, source, prefix-char) block is truncated deterministically
    (keep-lowest-id, logged drop). At threshold 0 every doc emits ALL its
    chars as prefix keys, so the expected capped output is exactly the
    distinct union over (lang, source, char) groups of pairs among each
    group's 4 lowest doc_ids — simulated independently here."""
    from collections import defaultdict
    from itertools import combinations

    import duckdb

    from snomed_ct_entity_linking_ray.pipelines import dedup

    sf = "/root/testdata/sf0.001"
    full = dedup.q_ngram_jaccard_pairs(sf, threshold=0.0).to_pandas()
    assert len(full) > 0  # threshold 0 keeps every verified pair

    capped = dedup.q_ngram_jaccard_pairs(sf, threshold=0.0, block_cap=4).to_pandas()

    docs = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    groups: dict = defaultdict(list)
    for did, t, lg, sc in zip(docs.doc_id, docs.text, docs.lang, docs.source):
        for c in set(t):  # empty text emits no keys
            groups[(lg, sc, c)].append(int(did))
    exp_pairs = set()
    for ids in groups.values():
        exp_pairs.update(combinations(sorted(ids)[:4], 2))
    key = lambda df: set(zip(df["doc_a"], df["doc_b"]))
    assert key(capped) == exp_pairs
    assert len(capped) < len(full)
    # capped output is a subset of the uncapped pairs
    assert key(capped) <= key(full)


def test_docs_io_dispatch(tmp_path):
    """Format dispatch: parquet reads work; a Lance-looking path without the
    lance package raises an informative ImportError (the documented
    substitution path)."""
    import pytest as _pytest

    from snomed_ct_entity_linking_ray import fixtures
    from snomed_ct_entity_linking_ray.sources import docs_io

    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir("/root/testdata/sf0.001"))
    ds = docs_io.read_docs(f"{fdir}/docs.parquet", override_num_blocks=4)
    assert ds.count() > 0
    assert not docs_io.is_lance_path(f"{fdir}/docs.parquet")
    assert docs_io.is_lance_path("/tmp/whatever.lance")
    with _pytest.raises(ImportError, match="[Ll]ance"):
        docs_io.read_docs("/tmp/whatever.lance")


def test_semi_anti_filter_join_path_matches_broadcast():
    """The hash left_semi/left_anti fallback (distinct-key count above
    max_broadcast) must produce exactly the broadcast-set result."""
    from snomed_ct_entity_linking_ray.pipelines.common import read, semi_anti_filter

    sf = "/root/testdata/sf0.001"

    def run(anti: bool, max_broadcast: int):
        out = semi_anti_filter(
            read(sf, "customer", ["c_custkey", "c_name"]),
            "c_custkey",
            read(sf, "events", ["user_id"]),
            "user_id",
            anti=anti,
            max_broadcast=max_broadcast,
        ).to_pandas()
        return out.sort_values(list(out.columns)).reset_index(drop=True)

    for anti in (False, True):
        bcast = run(anti, 10**9)
        joined = run(anti, 0)
        assert list(bcast.columns) == list(joined.columns)
        import pandas as pd

        pd.testing.assert_frame_equal(bcast, joined)
    # sanity: semi + anti partition the probe side
    n_total = read(sf, "customer", ["c_custkey"]).count()
    assert len(run(False, 0)) + len(run(True, 0)) == n_total


def test_propagate_rejects_negative_node_ids():
    """Negative ids collide with the -1 label-carrier sentinel; the stage
    must fail loudly instead of silently mis-propagating."""
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from snomed_ct_entity_linking_ray.stages.components import (
        connected_components_propagate,
    )

    edges = rd.from_pandas(pd.DataFrame({"u": [1, -2], "v": [2, 3]}))
    with _pytest.raises(Exception, match="non-negative"):
        connected_components_propagate(edges, num_partitions=2)


def test_torch_encoder_slot():
    """The torch variant of the A2 encoder slot: on a torch-less box it
    must raise an informative ImportError; where torch exists it must be
    numerically equal to NumpyEncoder on the same artifact."""
    import numpy as np
    import pytest as _pytest

    from snomed_ct_entity_linking_ray.functions import encoder as enc

    enc.ensure_encoder_artifact()
    try:
        import torch  # noqa: F401
        have_torch = True
    except ImportError:
        have_torch = False
    if not have_torch:
        with _pytest.raises(ImportError, match="[Tt]orch"):
            enc.TorchEncoder()
        return
    texts = ["acute pain left knee", "chronic heart failure", ""]
    a = enc.NumpyEncoder().encode(texts)
    b = enc.TorchEncoder().encode(texts)
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_lsh_codes_layout_independent():
    """Bucket codes are exact int64 dot products: any batch split of the
    embedding matrix yields bitwise-identical codes (the property that
    makes LSH bucket membership deterministic across block layouts)."""
    import numpy as np

    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        lsh_codes,
        lsh_hyperplanes,
    )

    rs = np.random.RandomState(5)
    E = rs.normal(size=(37, 16)).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    H = lsh_hyperplanes(16)
    full = lsh_codes(E, H)
    parts = np.concatenate(
        [lsh_codes(E[i : i + 7], H) for i in range(0, 37, 7)], axis=1
    )
    assert np.array_equal(full, parts)


def test_lsh_topk_invariants(ray_session):
    """LSH top-k structural contract on the fixture: per-query ranks are
    contiguous from 1, and every returned match genuinely shares an LSH
    bucket with its query (recomputed locally from the scheme). Recall vs
    exact top-k is data-dependent (random embeddings have low bucket
    collision rates by design) and is NOT asserted — the oracle compare
    checks exactness of the approximate contract itself."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines import vectors

    sf = "/root/testdata/sf0.001"
    lsh = vectors.q_cosine_topk_lsh(sf, k=5).to_pandas()
    assert len(lsh) > 0
    for _q, g in lsh.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))

    spec_dir = sf
    t = pq.read_table(os.path.join(spec_dir, "embeddings.parquet"))
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    H = vectors.lsh_hyperplanes(E.shape[1])
    codes = vectors.lsh_codes(E, H)  # [L, n]
    pos = {int(v): i for i, v in enumerate(vid)}
    for r in lsh.itertuples():
        qi, ci = pos[int(r.query_id)], pos[int(r.match_id)]
        assert any(
            codes[t_][qi] == codes[t_][ci] for t_ in range(H.shape[0])
        ), (r.query_id, r.match_id)


def test_small_qty_revenue_brute_force():
    """Decorrelated Q17: the distributed two-pass result equals the naive
    per-part average + filter at sf0.001, on both plan branches."""
    import numpy as np

    from snomed_ct_entity_linking_ray.pipelines import relational as R
    from snomed_ct_entity_linking_ray.pipelines.common import cents

    sf = "/root/testdata/sf0.001"
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity", "l_extendedprice"])
    g = li.groupby("l_partkey")["l_quantity"]
    avg = (g.sum().astype(np.int64) / g.count().astype(np.int64))
    thr = li["l_partkey"].map(0.2 * avg)
    keep = li["l_quantity"].to_numpy(np.float64) < thr.to_numpy(np.float64)
    exp_rev = int(cents(li.loc[keep, "l_extendedprice"]).sum())
    for kw in ({}, {"max_broadcast": 0}):  # broadcast plan AND join plan
        got = R.q_small_qty_revenue(sf, **kw)
        assert int(got["revenue_cents"].iloc[0]) == exp_rev, kw
        assert int(got["n_rows"].iloc[0]) == int(keep.sum()), kw


def test_market_share_consistency():
    """Q8 share invariants: numerator <= denominator per year, share is the
    exact single division, and the total over years equals the plain
    region-filtered revenue sum computed independently."""
    import numpy as np

    from snomed_ct_entity_linking_ray.pipelines import relational as R
    from snomed_ct_entity_linking_ray.pipelines.common import cents

    sf = "/root/testdata/sf0.001"
    got = R.q_market_share(sf)
    assert (got["nation_ccents"] <= got["total_ccents"]).all()
    assert (
        got["mkt_share"].to_numpy()
        == got["nation_ccents"].to_numpy(np.float64)
        / got["total_ccents"].to_numpy(np.float64)
    ).all()
    # independent denominator: pandas join over the same tables
    nat = pd.read_parquet(f"{sf}/nation.parquet")
    reg = pd.read_parquet(f"{sf}/region.parquet")
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia.loc[asia["r_name"] == "ASIA", "n_nationkey"]
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    ck = cust.loc[cust["c_nationkey"].isin(asia), "c_custkey"]
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    ok = orders[orders["o_custkey"].isin(ck)][["o_orderkey"]]
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    li = li.merge(ok, left_on="l_orderkey", right_on="o_orderkey")
    exp_total = int(
        (cents(li["l_extendedprice"]) * (100 - cents(li["l_discount"]))).sum()
    )
    assert int(got["total_ccents"].sum()) == exp_total


def test_grouped_max_matches_pandas():
    """_grouped_max partial-then-final == a single flat groupby max,
    including across many small input blocks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from snomed_ct_entity_linking_ray.pipelines.relational import _grouped_max

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"k": rng.integers(0, 50, 2000), "v": rng.integers(-10**9, 10**9, 2000)}
    )
    ds = rd.from_pandas(df).repartition(13)
    got = (
        _grouped_max(ds, "k", "v", "mx", n_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg(mx=("v", "max"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"k": "int64", "mx": "int64"}), exp)


def test_event_seq_dense_per_user():
    """Per user, seq is a dense 1..n permutation and follows (ts, event_id)
    order."""
    import pandas as pd

    from snomed_ct_entity_linking_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    got = relational.q_event_seq(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    assert len(got) == len(ev)
    m = got.merge(ev, on=["event_id", "user_id"])
    for _, g in m.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        assert g["seq"].tolist() == list(range(1, len(g) + 1))


def test_event_type_pivot_row_sums():
    """Pivot counts per user sum to that user's event count, and each column
    matches a direct filtered count."""
    import pandas as pd

    from snomed_ct_entity_linking_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    got = relational.q_event_type_pivot(sf).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    totals = ev.groupby("user_id").size()
    cols = [c for c in got.columns]
    assert (got[cols].sum(axis=1).sort_index() == totals.sort_index()).all()
    clicks = ev[ev["event_type"] == "click"].groupby("user_id").size()
    assert (
        got["n_click"].reindex(clicks.index).sort_index() == clicks.sort_index()
    ).all()


def test_empty_side_join_completes():
    """Regression: a hash join whose entire input sequence delivers no
    blocks used to deadlock the streaming executor or fail with
    ArrowInvalid inside the aggregator (upstream ray 2.49.2 defect —
    schemas are only broadcast on each sequence's first data block).
    stages/joinsafe.py guards the zero-column finalize; this pins both
    the inner-join empty result and the anti-join keep-all result."""
    import pandas as pd

    from snomed_ct_entity_linking_ray.pipelines.common import read

    sf = "/root/testdata/sf0.001"
    li = read(sf, "lineitem", ["l_orderkey"])
    empty = li.map_batches(lambda df: df.iloc[:0], batch_format="pandas")
    orders = read(sf, "orders", ["o_orderkey", "o_custkey"])
    j = empty.join(orders, "inner", num_partitions=2,
                   on=("l_orderkey",), right_on=("o_orderkey",))
    assert j.count() == 0

    n_orders = orders.count()
    anti = orders.join(empty, "left_anti", num_partitions=2,
                       on=("o_orderkey",), right_on=("l_orderkey",))
    assert anti.count() == n_orders


def test_volume_shipping_empty_filter_small_sf():
    """q_volume_shipping at sf0.001 filters lineitem to zero rows (no
    supplier of the two nations ships in-window) — the query must still
    complete and return the empty frame, not deadlock (the cascade-join
    shape that exposed the upstream empty-side bug)."""
    from snomed_ct_entity_linking_ray.pipelines import relational

    df = relational.q_volume_shipping("/root/testdata/sf0.001")
    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    assert len(df) == 0


def test_empty_side_outer_join_semantics():
    """Pin the joinsafe degenerate-case table for the outer joins: a
    block-less right sequence under left_outer/full_outer keeps ALL left
    rows (with the surviving side's own schema — the documented caveat),
    and an inner join against it still completes empty."""
    from snomed_ct_entity_linking_ray.pipelines.common import read

    sf = "/root/testdata/sf0.001"
    orders = read(sf, "orders", ["o_orderkey", "o_custkey"])
    n_orders = orders.count()
    li = read(sf, "lineitem", ["l_orderkey"])
    empty = li.map_batches(lambda df: df.iloc[:0], batch_format="pandas")

    lo = orders.join(empty, "left_outer", num_partitions=2,
                     on=("o_orderkey",), right_on=("l_orderkey",))
    assert lo.count() == n_orders

    fo = orders.join(empty, "full_outer", num_partitions=2,
                     on=("o_orderkey",), right_on=("l_orderkey",))
    assert fo.count() == n_orders

    ro = empty.join(orders, "right_outer", num_partitions=2,
                    on=("l_orderkey",), right_on=("o_orderkey",))
    assert ro.count() == n_orders


def test_exact_quantiles_edge_shapes(tmp_path):
    """q_exact_quantiles on degenerate groups: a constant-valued group
    (min == max → every row lands in bin 0), a single-row group, and a
    two-value group — the driver's bin walk and residual-rank walk must
    agree with a plain sorted-rank computation on each."""
    import math

    import numpy as np

    from snomed_ct_entity_linking_ray.pipelines.relational import q_exact_quantiles

    rows = []
    # constant group: 7 rows of the same price
    rows += [("C", 12.34)] * 7
    # singleton group
    rows += [("S", 99.99)]
    # two-value group, skewed counts
    rows += [("T", 1.00)] * 9 + [("T", 2.00)]
    df = pd.DataFrame(rows, columns=["l_returnflag", "l_extendedprice"])
    df["l_quantity"] = 1.0
    df["l_discount"] = 0.0
    df["l_linestatus"] = "O"
    df.to_parquet(str(tmp_path / "lineitem.parquet"))

    out = q_exact_quantiles(str(tmp_path)).set_index("l_returnflag")
    for g, vals in (("C", [1234] * 7), ("S", [9999]), ("T", [100] * 9 + [200])):
        s = sorted(vals)
        assert out.loc[g, "n_rows"] == len(vals)
        for q in (0.5, 0.9, 0.99):
            k = max(1, math.ceil(q * len(vals)))
            assert out.loc[g, f"p{int(q*100)}_cents"] == s[k - 1], (g, q)


def test_mmr_topk_invariants(ray_session):
    """MMR structural contract on the fixture: per-query ranks contiguous
    from 1 with no repeated match; rank-1 equals the pure-relevance top-1
    (the first greedy pick is relevance-only); and the picked set is a
    subset of the relevance top-pool (MMR reorders within the pool, it
    never reaches outside it)."""
    import numpy as np
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines import vectors

    sf = "/root/testdata/sf0.001"
    out = vectors.q_mmr_topk(sf, k=6, pool=24).to_pandas()
    assert len(out) > 0

    t = pq.read_table(f"{sf}/embeddings.parquet")
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    isq = vid < vectors.N_QUERIES
    qid, Q = vid[isq], E[isq]
    cid, C = vid[~isq], E[~isq]

    for q, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert g["match_id"].is_unique
        rel = np.rint((C @ Q[list(qid).index(q)]) * 1e6).astype(np.int64)
        order = sorted(range(len(cid)), key=lambda i: (-rel[i], cid[i]))
        top1 = int(cid[order[0]])
        pool = {int(cid[i]) for i in order[:24]}
        assert int(g["match_id"].iloc[0]) == top1
        assert set(g["match_id"].astype(int)) <= pool


def test_pq_codes_invariants(ray_session):
    """PQ structural contract: every code packs m 4-bit fields (so it is
    within [0, 16^4)), all vectors are coded, and decoding each subspace
    id re-assigns the vector to its genuinely nearest final centroid
    under the integer metric (verified for subspace 0 by recomputing the
    codebook independently is out of scope — the oracle parity pins
    exactness; here we pin the packing + coverage)."""
    from snomed_ct_entity_linking_ray.pipelines import vectors

    sf = "/root/testdata/sf0.001"
    out = vectors.q_pq_codes(sf).to_pandas()
    import pyarrow.parquet as pq

    n = len(pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id"]))
    assert len(out) == n
    assert out["vec_id"].is_unique
    codes = out["pq_code"].to_numpy()
    assert (codes >= 0).all() and (codes < 16**4).all()


def test_em_weights_separates(ray_session):
    """On the fixture's pattern histogram the EM fixed point must be
    separating: every field's match probability m exceeds its unmatch
    probability u (w_agree positive, w_disagree negative) — the sanity
    property Winkler-style unsupervised estimation is used for."""
    from snomed_ct_entity_linking_ray.pipelines import er

    out = er.q_em_weights("/root/testdata/sf0.001")
    assert len(out) == 3
    assert (out["m_micro"] > out["u_micro"]).all()
    assert (out["w_agree_micro"] > 0).all()
    assert (out["w_disagree_micro"] < 0).all()


def test_value_outliers_matches_float_zscore(ray_session):
    """The integer-sqrt outlier contract must agree with the plain float
    z-score definition except within float rounding of the boundary —
    on the fixture the margin is far wider than an ulp, so the sets are
    equal."""
    import numpy as np
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.q_value_outliers(sf).to_pandas()
    df = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "event_type", "value"]).to_pandas()
    v = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    flagged = set()
    for et, g in df.assign(c=v).groupby("event_type"):
        c = g["c"].to_numpy(np.float64)
        mu, sd = c.mean(), c.std()  # population std, matches n*ss - s^2 form
        m = np.abs(c - mu) > 3 * sd
        flagged |= set(g["event_id"].to_numpy()[m].tolist())
    assert set(out["event_id"].tolist()) == flagged


def test_media_clusters_invariants(ray_session):
    """cluster_rep is a member of the cluster, minimal within it, and
    every doc-with-media appears exactly once (r4p media_clusters)."""
    from snomed_ct_entity_linking_ray.pipelines.multimodal import (
        media_rows,
        q_media_clusters,
    )

    sf = "/root/testdata/sf0.001"
    out = q_media_clusters(sf).to_pandas()
    docs_with_media = set(
        media_rows(sf).to_pandas()["doc_id"].astype(str).unique()
    )
    assert set(out["doc_id"]) == docs_with_media
    assert out["doc_id"].is_unique
    # rep is the min member of its cluster, and reps are members
    by_rep = out.groupby("cluster_rep")["doc_id"].min()
    assert (by_rep.index == by_rep.to_numpy()).all()


def test_crosslink_best_invariants(ray_session):
    """One decision per A-record; the decision is deterministic argmax
    with lexicographic tie-break; scores clear the threshold; sources
    are disjoint by construction (r4p crosslink_best)."""
    import numpy as np

    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler
    from snomed_ct_entity_linking_ray.pipelines.er import (
        CROSSLINK_JW_THRESHOLD,
        JW_UBIN_SCALE,
        q_crosslink_best,
    )

    sf = "/root/testdata/sf0.001"
    out = q_crosslink_best(sf).to_pandas()
    assert len(out) > 0
    assert out["name_a"].is_unique
    assert (out["jw_ubin"] >= int(CROSSLINK_JW_THRESHOLD * JW_UBIN_SCALE)).all()
    # spot-check the quantized score against the pinned kernel
    for _, r in out.head(5).iterrows():
        assert r["jw_ubin"] == int(
            np.floor(jaro_winkler(r["name_a"], r["best_b"]) * JW_UBIN_SCALE)
        )


def test_greedy_assignment_one_to_one(ray_session):
    """Greedy assignment is a matching: each A-name and each B-name
    appears at most once; scores clear the threshold (r4p)."""
    from snomed_ct_entity_linking_ray.pipelines.er import (
        CROSSLINK_JW_THRESHOLD,
        JW_UBIN_SCALE,
        q_greedy_assignment,
    )

    out = q_greedy_assignment("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert out["name_a"].is_unique
    assert out["name_b"].is_unique
    assert (out["jw_ubin"] >= int(CROSSLINK_JW_THRESHOLD * JW_UBIN_SCALE)).all()


def test_kcore_every_member_keeps_k(ray_session):
    """Every member of the 2-core has >= 2 within-core neighbors, and the
    core is a subset of the names with match edges (r4p kcore)."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_kcore

    out = q_kcore("/root/testdata/sf0.001").to_pandas()
    assert (out["degree"] >= 2).all()
    assert out["p_name"].is_unique


def test_pprl_pairs_dice_bounds(ray_session):
    """PPRL Dice scores are valid micro-unit coefficients above the
    threshold, pairs are canonical and unique (r4p pprl_pairs)."""
    from snomed_ct_entity_linking_ray.pipelines.er import (
        PPRL_DICE_MICRO,
        q_pprl_pairs,
    )

    out = q_pprl_pairs("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["dice_micro"] >= PPRL_DICE_MICRO).all()
    assert (out["dice_micro"] <= 1_000_000).all()
    assert (out["name_a"] < out["name_b"]).all()
    assert not out.duplicated(subset=["name_a", "name_b"]).any()


def test_gate_order_self_maintaining():
    """The driver gates the first 50 queries(); _gate_order must put
    not-yet-green queries first, respect _REGATE_FROM_ROUND, and rotate
    once green rows appear (r4p)."""
    import __ray_entry__ as entry

    reg = {"a": 1, "b": 2, "c": 3}
    # nothing green: curated order preserved
    assert list(entry._gate_order(reg, green={})) == ["a", "b", "c"]
    # b green: b drops to the back, a/c keep relative order
    assert list(entry._gate_order(reg, green={"b": 3})) == ["a", "c", "b"]
    # a regate-required query with only an OLD green row stays in front
    old = dict(entry._REGATE_FROM_ROUND)
    try:
        entry._REGATE_FROM_ROUND["b"] = 4
        assert list(entry._gate_order(reg, green={"b": 3})) == ["a", "b", "c"]
        assert list(entry._gate_order(reg, green={"b": 4})) == ["a", "c", "b"]
    finally:
        entry._REGATE_FROM_ROUND.clear()
        entry._REGATE_FROM_ROUND.update(old)
    # the real registry: every entry in the 50-gate prefix must currently
    # be pending (no wasted gate slots)
    keys = list(entry.queries())
    green = entry._green_rounds()
    for k in keys[:50]:
        assert green.get(k, -1) < entry._REGATE_FROM_ROUND.get(k, 0), k


def test_stable_matching_no_blocking_pair(ray_session):
    """The defining stability property: no (a, b) candidate pair exists
    where BOTH prefer each other over their assigned partners (r4p)."""
    import numpy as np

    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler
    from snomed_ct_entity_linking_ray.pipelines.er import (
        CROSSLINK_JW_THRESHOLD,
        JW_UBIN_SCALE,
        _crosslink_candidates,
        q_stable_matching,
    )

    sf = "/root/testdata/sf0.001"
    out = q_stable_matching(sf).to_pandas()
    assert len(out) > 0
    assert out["name_a"].is_unique and out["name_b"].is_unique
    match_of_a = dict(zip(out["name_a"], zip(out["name_b"], out["jw_ubin"])))
    match_of_b = dict(zip(out["name_b"], zip(out["name_a"], out["jw_ubin"])))
    cand = (
        _crosslink_candidates(sf, CROSSLINK_JW_THRESHOLD, 3, 4)
        .to_pandas()
        .drop_duplicates(subset=["name_a", "cand"])
    )
    for _, r in cand.iterrows():
        a, b, s = r["name_a"], r["cand"], int(r["jw_ubin"])
        # a prefers (s, b) over its current match?
        cur_a = match_of_a.get(a)
        a_prefers = cur_a is None or (-s, b) < (-cur_a[1], cur_a[0])
        cur_b = match_of_b.get(b)
        b_prefers = cur_b is None or (-s, a) < (-cur_b[1], cur_b[0])
        assert not (a_prefers and b_prefers), (a, b, s, cur_a, cur_b)
