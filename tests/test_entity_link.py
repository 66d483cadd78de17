"""End-to-end flagship pipeline tests (FIXTURES.md test tiers):
pairwise F1 ≥ 0.99 on gold_pairs, full gold recall, structural invariants
(no per-doc overlaps, no duplicate (doc_id,start)), span-sequence equality.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from snomed_ct_entity_linking_ray import fixtures
from snomed_ct_entity_linking_ray.functions.docs import span_signature
from snomed_ct_entity_linking_ray.pipelines import entity_link as el

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fdir():
    return fixtures.fixture_dir(fixtures.spec_for_sf_dir(SF))


@pytest.fixture(scope="module")
def linked(fdir):
    return el.run_entity_link(SF).to_pandas()


def test_mentions_cover_gold(fdir):
    gold = pq.read_table(f"{fdir}/gold_mentions.parquet").to_pandas()
    m = el.q_mentions(SF).to_pandas()
    found = set(zip(m.doc_id, m.start, m.end))
    missing = [
        r for r in gold.itertuples() if (r.doc_id, r.start, r.end) not in found
    ]
    assert not missing, missing[:5]


def test_pairwise_f1_gate(fdir):
    """The BASELINE.json metric: pairwise F1 ≥ 0.99 on labeled pairs."""
    gold_pairs = pq.read_table(f"{fdir}/gold_pairs.parquet").to_pandas()
    lp = el.linked_pairs(SF).to_pandas()
    pred = set(zip(lp.mention_id, lp.concept_id))
    tp = fp = fn = 0
    for r in gold_pairs.itertuples():
        cid = int(r.right_id.split(":")[1])
        hit = (r.left_id, cid) in pred
        if r.label and hit:
            tp += 1
        elif r.label:
            fn += 1
        elif hit:
            fp += 1
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    f1 = 2 * prec * rec / max(1e-9, prec + rec)
    assert f1 >= 0.99, (f1, prec, rec, tp, fp, fn)


def test_no_overlaps_and_no_dups(linked):
    """Reference invariants: no overlapping spans per note (1st Place/src/
    mimic_dev_main.py:165-189), no duplicate (note_id, start)
    (3rd Place/src/snomedctentitylinking.py:711-714)."""
    assert not linked.duplicated(subset=["doc_id", "start"]).any()
    for doc_id, g in linked.groupby("doc_id"):
        g = g.sort_values("start")
        prev_end = -1
        for r in g.itertuples():
            assert r.start >= prev_end, (doc_id, r)
            prev_end = r.end


def test_linked_concepts_match_gold(fdir, linked):
    """Cluster majority vote assigns the planted concept for ≥99% of gold
    spans (collision surfaces may legitimately flip to the modal concept)."""
    gold = pq.read_table(f"{fdir}/gold_mentions.parquet").to_pandas()
    pred = {(r.doc_id, r.start): r.concept_id for r in linked.itertuples()}
    total = correct = spanned = 0
    for r in gold.itertuples():
        total += 1
        got = pred.get((r.doc_id, r.start))
        if got is not None:
            spanned += 1
            if got == r.concept_id:
                correct += 1
    assert spanned / total >= 0.95, (spanned, total)
    assert correct / spanned >= 0.98, (correct, spanned)


def test_grouped_resolution_matches_block(linked):
    """The shuffle-based fallback (resolution='grouped', for layouts where
    blocks split mid-doc) produces exactly the block path's output."""
    import pandas as pd

    g = (
        el.run_entity_link(SF, resolution="grouped")
        .to_pandas()
        .sort_values(["doc_id", "start", "end"])
        .reset_index(drop=True)
    )
    b = linked.sort_values(["doc_id", "start", "end"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["doc_id", "start", "end", "concept_id"]],
        b[["doc_id", "start", "end", "concept_id"]],
    )


def test_resolution_invariant_detects_split_docs():
    """A doc split across blocks (rows present < doc_n) must fail LOUDLY in
    the no-shuffle resolution path, not silently emit overlaps."""
    import numpy as np
    import pandas as pd

    g = pd.DataFrame(
        {
            "doc_id": ["d", "d"],
            "start": np.array([0, 5], dtype=np.int32),
            "end": np.array([3, 8], dtype=np.int32),
            "cluster_concept": np.array([1, 1], dtype=np.int64),
            "doc_n": np.array([3, 3], dtype=np.int32),  # one row missing
        }
    )
    with pytest.raises(RuntimeError, match="doc-contiguity"):
        el._resolve_frame(g)
    # complete doc passes
    ok = g.copy()
    ok["doc_n"] = np.array([2, 2], dtype=np.int32)
    out = el._resolve_frame(ok)
    assert len(out) == 2


def test_span_sequence_equality(fdir):
    """input_hint invariant: the docs' (kind, text, media_ref, order) span
    sequences survive the pipeline's read+flatten path untouched."""
    import ray.data as rd

    from snomed_ct_entity_linking_ray.functions.docs import flatten_batch

    docs_in = pq.read_table(f"{fdir}/docs.parquet")
    out = (
        rd.read_parquet(f"{fdir}/docs.parquet")
        .map_batches(flatten_batch, batch_format="pyarrow")
        .to_pandas()
    )
    sig_in = {
        d: span_signature(s)
        for d, s in zip(docs_in["doc_id"].to_pylist(), docs_in["spans"].to_pylist())
    }
    assert len(out) == docs_in.num_rows
    for r in out.itertuples():
        spans = [dict(s) for s in r.spans]
        assert span_signature(spans) == sig_in[r.doc_id]


def test_pair_plans_agree():
    """Broadcast (shuffle-free) vs grouped (groupby exchange) pair plans
    emit the IDENTICAL pair set on the fixture corpus (cap not binding),
    so plan choice cannot change any downstream link."""
    import numpy as np
    import ray

    mentions, state, _ = el.extract_mentions(
        SF, emit_sections=False, fuse_freq=True
    )
    mentions = mentions.materialize()
    freq_n = el.freq_totals(state, mentions)

    bc_pairs, plan = el.candidate_pairs_auto(mentions, state, freq_n)
    assert plan == "broadcast"
    m_salted, c_keys, _hot = el.blocked_sides(mentions, state, freq_n)
    gr_pairs = el.candidate_pairs(m_salted, c_keys)

    cols = ["node", "m_sid", "concept_id", "c_sid"]
    bc = bc_pairs.to_pandas()[cols]
    gr = gr_pairs.to_pandas()[cols]
    assert len(bc) == len(gr) and len(bc) > 0
    key = lambda df: sorted(map(tuple, df.to_numpy().tolist()))  # noqa: E731
    assert key(bc) == key(gr)


def test_broadcast_pairgen_cap(monkeypatch):
    """Over-cap blocks: the driver-computed node-hash threshold bounds the
    pair count deterministically (same subset on every call) and leaves
    under-cap blocks untouched."""
    import numpy as np
    import pandas as pd
    import ray

    monkeypatch.setattr(el, "BLOCK_CAP", 8)
    surfaces = ["abc one", "abc two", "abd three"]
    state = {
        "surfaces": surfaces,
        "surface_to_cids": {
            "abc one": [1], "abc two": [2], "abd three": [3]
        },
        "block_of_sid": np.array(
            [el.prefix_block_id(s[:3]) for s in surfaces], dtype=np.int64
        ),
    }
    # block 'abc': 40 mentions x 2 concepts = 80 pairs > cap 8
    freq_n = np.array([20, 20, 3], dtype=np.int64)
    csr = el.concept_block_state(state, freq_n)
    assert (csr["thr"] != np.uint64(0xFFFFFFFFFFFFFFFF)).sum() == 1

    rng = np.random.RandomState(7)
    n = 43
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(n)],
            "start": np.arange(n, dtype=np.int32),
            "end": np.arange(n, dtype=np.int32) + 5,
            "sid": np.array([0] * 20 + [1] * 20 + [2] * 3, dtype=np.int32),
        }
    )
    gen = el.BroadcastPairGen(
        ray.put(csr), ray.put(state["block_of_sid"])
    )
    out1 = gen(df)
    out2 = gen(df)
    pd.testing.assert_frame_equal(out1, out2)  # deterministic
    # under-cap block 'abd' untouched: its 3 mentions pair with nothing
    # (only their own surface's concept, filtered as same-sid)
    assert (out1["m_sid"] == 2).sum() == 0
    # capped block emits FEWER pairs than the uncapped 40 (20x1 each side)
    assert 0 < len(out1) < 40


def test_grouped_fallback_plan_e2e(monkeypatch, linked):
    """Forcing the grouped fallback plan (as if the dictionary were too
    large to broadcast) produces the exact same linked output."""
    monkeypatch.setattr(el, "BROADCAST_PAIRGEN_MAX_ROWS", 0)
    tm = {}
    out = el.run_entity_link(SF, timings=tm).to_pandas()
    assert tm["pair_plan"] == "grouped"
    key = ["doc_id", "start", "end", "concept_id"]
    a = out[key].sort_values(key).reset_index(drop=True)
    b = linked[key].sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_concept_block_state_csr_integrity():
    """The broadcast CSR partitions the dictionary exactly: every
    (surface, concept) pair appears once, under its surface's block id,
    and blk_ids are sorted unique (searchsorted contract)."""
    import numpy as np

    surfaces = ["alpha x", "alpha y", "beta z", "gamma q"]
    s2c = {"alpha x": [10, 11], "alpha y": [12], "beta z": [13], "gamma q": [14]}
    state = {
        "surfaces": surfaces,
        "surface_to_cids": s2c,
        "block_of_sid": np.array(
            [el.prefix_block_id(s[:3]) for s in surfaces], dtype=np.int64
        ),
    }
    csr = el.concept_block_state(state, np.ones(len(surfaces), dtype=np.int64))
    blk = csr["blk_ids"]
    assert np.array_equal(blk, np.sort(np.unique(blk)))
    assert csr["offsets"][0] == 0 and csr["offsets"][-1] == csr["n_rows"] == 5
    got = set()
    for i in range(len(blk)):
        lo, hi = csr["offsets"][i], csr["offsets"][i + 1]
        for sid, cid in zip(csr["values_sid"][lo:hi], csr["values_cid"][lo:hi]):
            assert state["block_of_sid"][sid] == blk[i]
            got.add((int(sid), int(cid)))
    want = {
        (i, c) for i, s in enumerate(surfaces) for c in s2c[s]
    }
    assert got == want
