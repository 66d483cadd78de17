"""Tests for terminology build (S3/S4/M11/D6), chunking (M14/M20/M21),
realignment (M23), context (M25), eval metrics (D5/G8), splits (T4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from snomed_ct_entity_linking_ray.functions import chunking, realign, splits
from snomed_ct_entity_linking_ray.functions.metrics import (
    per_doc_concept_set_iou,
    span_prf,
)
from snomed_ct_entity_linking_ray.sources import terminology


def test_terminology_build_s3():
    concepts = rd.from_pandas(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4],
                "active": [1, 1, 0, 1],
                "fsn": [
                    "Pain (finding)",
                    "Appendectomy (procedure)",
                    "Old thing (finding)",
                    "Something (qualifier value)",
                ],
            }
        )
    )
    descriptions = rd.from_pandas(
        pd.DataFrame(
            {
                "conceptId": [1, 1, 2, 3, 4],
                "active": [1, 1, 1, 1, 1],
                "term": ["Pain (finding)", "Ache", "Appendectomy (procedure)", "x", "y"],
                "typeId": [
                    900000000000003001,
                    900000000000013009,
                    900000000000003001,
                    900000000000003001,
                    900000000000003001,
                ],
            }
        )
    )
    out = terminology.build_concept_table(concepts, descriptions).to_pandas()
    # inactive concept 3 and disallowed-hierarchy concept 4 excluded
    assert set(out["concept_id"]) == {1, 2}
    kinds = dict(zip(out["name"], out["kind"]))
    assert kinds["Ache"] == "SYN" and kinds["Pain (finding)"] == "FSN"
    assert set(out["hierarchy"]) == {"finding", "procedure"}


def test_priority_dedup_d6():
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "key": ["a", "a", "b", "b", "b"],
                "val": ["first", "second", "x", "y", "z"],
                "source_rank": [1, 0, 2, 0, 1],
            }
        )
    )
    out = terminology.priority_dedup(ds, ["key"]).to_pandas().set_index("key")
    assert out.loc["a", "val"] == "second"  # rank 0 wins
    assert out.loc["b", "val"] == "y"


def test_abbreviation_match_m11():
    abbrs = rd.from_pandas(
        pd.DataFrame(
            {
                "abbr": ["MI", "COPD", "XYZ"],
                "meaning": ["Myocardial infarction", "chronic obstructive pulmonary disease", "no such concept"],
            }
        )
    )
    concepts = rd.from_pandas(
        pd.DataFrame(
            {
                "concept_id": [10, 20],
                "name": ["Myocardial Infarction (disorder)", "Chronic Obstructive Pulmonary Disease"],
            }
        )
    )
    out = terminology.abbreviation_match(abbrs, concepts).to_pandas()
    got = dict(zip(out["abbr"], out["concept_id"]))
    assert got == {"MI": 10, "COPD": 20}


def test_chunk_by_tokens_m14():
    text = "one two three four five six seven"
    chunks = chunking.chunk_by_tokens(text, max_tokens=3)
    assert [text[s:e] for s, e in chunks] == [
        "one two three",
        "four five six",
        "seven",
    ]
    # with overlap
    ov = chunking.chunk_by_tokens(text, max_tokens=3, overlap=1)
    assert text[ov[1][0] : ov[1][1]].startswith("three")


def test_chunk_sections_and_merge_m20_m21():
    text = "Header A:\none two three. four five six.\nHeader B:\nseven eight.\n"
    sections = [("Header A", 0, 40), ("Header B", 40, len(text))]
    chunks = chunking.chunk_sections(text, sections, max_tokens=4)
    assert all(text[s:e].strip() for s, e, _ in chunks)
    # section boundary never crossed
    for s, e, h in chunks:
        if h == "Header A":
            assert e <= 40
    merged = chunking.merge_chunks(chunks, max_tokens=50, text=text)
    assert len(merged) == 1
    s, e, h = merged[0]
    assert s == chunks[0][0] and e == chunks[-1][1] and "|" in h or len(chunks) == 1


def test_realign_m23():
    original = "the patient has severe chest pain today"
    echoed = "the patient has <t>severe chest pain</t> today extra"
    i = echoed.index("severe")
    j = echoed.index("pain") + 4
    res = realign.realign_span(original, echoed, i, j)
    assert res is not None
    s, e = res
    assert original[s:e] == "severe chest pain"


def test_extract_context_m25():
    text = "alpha beta gamma delta epsilon zeta eta"
    s = text.index("delta")
    ctx = realign.extract_context(text, s, s + 5, n_words=2)
    assert ctx == "beta gamma delta epsilon zeta"
    ctx2 = realign.extract_context(text, s, s + 5, n_words=1, section="Allergies")
    assert ctx2.startswith("Allergy to delta finding | ")


def test_span_prf_d5():
    gold = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": ["d", "d", "e"], "start": [0, 5, 0], "end": [3, 8, 2],
             "concept_id": [1, 2, 3]}
        )
    )
    pred = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": ["d", "d", "e"], "start": [0, 5, 4], "end": [3, 8, 6],
             "concept_id": [1, 9, 3]}
        )
    )
    m = span_prf(pred, gold)
    assert (m["tp"], m["fp"], m["fn"]) == (1, 2, 2)


def test_per_doc_concept_set_iou_g8():
    gold = rd.from_pandas(
        pd.DataFrame({"doc_id": ["d", "d"], "start": [0, 5], "end": [1, 6],
                      "concept_id": [1, 2]})
    )
    pred = rd.from_pandas(
        pd.DataFrame({"doc_id": ["d"], "start": [0], "end": [1], "concept_id": [1]})
    )
    out = per_doc_concept_set_iou(pred, gold).to_pandas()
    assert out.iloc[0]["iou"] == pytest.approx(0.5)


def test_splits_t4():
    df = pd.DataFrame({"k": [f"id{i}" for i in range(1000)], "v": range(1000)})
    ds = rd.from_pandas(df)
    train, test = splits.train_test_split(ds, "k", test_fraction=0.25, seed=1)
    nt, ns = train.count(), test.count()
    assert nt + ns == 1000 and 150 < ns < 350
    # determinism
    train2, test2 = splits.train_test_split(rd.from_pandas(df), "k", 0.25, seed=1)
    assert sorted(test.to_pandas()["k"]) == sorted(test2.to_pandas()["k"])
    folds = splits.kfold_assign(ds, "k", k=5).to_pandas()
    assert set(folds["fold"]) == set(range(5))
    vc = folds["fold"].value_counts()
    assert vc.min() > 100
