"""Determinism: two full flagship runs in one session produce identical
output (required for resumable/idempotent semantics, SURVEY.md §4
stragglers row — every UDF deterministic & idempotent)."""

from __future__ import annotations

from snomed_ct_entity_linking_ray.pipelines import entity_link as el

SF = "/root/testdata/sf0.001"
KEY = ["doc_id", "start", "end", "concept_id"]


def test_run_twice_identical():
    a = el.run_entity_link(SF).to_pandas()[KEY].sort_values(KEY).reset_index(drop=True)
    b = el.run_entity_link(SF).to_pandas()[KEY].sort_values(KEY).reset_index(drop=True)
    assert a.equals(b)


def test_mentions_deterministic():
    a = el.q_mentions(SF).to_pandas().sort_values(["doc_id", "start", "end"]).reset_index(drop=True)
    b = el.q_mentions(SF).to_pandas().sort_values(["doc_id", "start", "end"]).reset_index(drop=True)
    assert a.equals(b)
