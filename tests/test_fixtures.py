"""Fixture generator invariants: determinism, offset correctness,
span-sequence integrity, skew plant."""

from __future__ import annotations

import pyarrow.parquet as pq

from snomed_ct_entity_linking_ray import fixtures
from snomed_ct_entity_linking_ray.functions.docs import span_signature


def _reconstruct(spans):
    return "".join(s["text"] for s in spans if s["kind"] == "text")


def test_deterministic():
    spec = fixtures.FixtureSpec(seed=42, n_docs=20, n_concepts=50)
    a = fixtures.generate(spec)
    b = fixtures.generate(spec)
    for k in a:
        assert a[k].equals(b[k]), k


def test_gold_offsets_exact(small_fixtures):
    d, _ = small_fixtures
    docs = pq.read_table(f"{d}/docs.parquet")
    gold = pq.read_table(f"{d}/gold_mentions.parquet")
    texts = {
        i: _reconstruct(s)
        for i, s in zip(docs["doc_id"].to_pylist(), docs["spans"].to_pylist())
    }
    for r in gold.to_pylist():
        assert texts[r["doc_id"]][r["start"] : r["end"]] == r["surface"]


def test_media_spans_and_offsets(small_fixtures):
    d, _ = small_fixtures
    docs = pq.read_table(f"{d}/docs.parquet")
    saw_media = False
    for spans in docs["spans"].to_pylist():
        pos = 0
        for s in spans:
            assert s["offset"] == pos if s["kind"] == "text" else True
            if s["kind"] == "text":
                assert s["media_ref"] == ""
                pos += len(s["text"])
            else:
                saw_media = True
                assert s["text"] == "" and s["media_ref"].startswith("media://")
                assert s["offset"] == pos
        # signature is stable
        assert span_signature(spans) == span_signature(spans)
    assert saw_media


def test_hot_surface_planted(small_fixtures):
    d, _ = small_fixtures
    gold = pq.read_table(f"{d}/gold_mentions.parquet")
    surf = gold["surface"].to_pylist()
    frac = sum(s == fixtures.HOT_SURFACE for s in surf)
    ndocs = len(set(gold["doc_id"].to_pylist()))
    assert frac >= 0.15 * ndocs  # ~30% of docs carry the hot surface


def test_gold_pairs_have_negatives(small_fixtures):
    d, _ = small_fixtures
    pairs = pq.read_table(f"{d}/gold_pairs.parquet")
    labels = pairs["label"].to_pylist()
    assert any(labels) and not all(labels)
