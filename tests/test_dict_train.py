"""Dictionary-training aggregates (G2/G5/G7) + attribute post-proc (M12)."""

from __future__ import annotations

import pandas as pd

from snomed_ct_entity_linking_ray.functions.attributes import extend_laterality
from snomed_ct_entity_linking_ray.pipelines import dict_train

SF = "/root/testdata/sf0.001"


def test_dict_majority_g2():
    df = dict_train.q_dict_majority(SF).to_pandas()
    assert len(df) > 0
    assert not df.duplicated(subset=["section", "surface"]).any()
    # hot surface appears with strong support
    hot = df[df["surface"] == "pain"]
    assert len(hot) > 0 and (hot["support"] >= 1).all()


def test_allowed_sections_g5():
    df = dict_train.q_allowed_sections(SF).to_pandas()
    assert set(df["hierarchy"]) <= {"finding", "procedure", "body structure", "?"}
    assert (df["n_sections"] >= 1).all()
    # sections string is sorted and pipe-joined
    for s in df["sections"]:
        parts = s.split("|")
        assert parts == sorted(parts)


def test_dict_precision_g7():
    df = dict_train.q_dict_precision(SF, threshold=0.9).to_pandas()
    assert len(df) > 0
    assert (df["tp"] / df["n"] >= 0.9).all()


def test_extend_laterality_m12():
    text = "noted left cardoss and right fendex today"
    spans = [
        {"start": 11, "end": 18, "concept_id": 100},
        {"start": 29, "end": 35, "concept_id": 200},
    ]
    assert text[11:18] == "cardoss" and text[29:35] == "fendex"
    ext = {(100, "left"): 101, (200, "right"): 201}
    out = extend_laterality(text, spans, ext)
    assert out[0]["concept_id"] == 101
    assert text[out[0]["start"] : out[0]["end"]] == "left cardoss"
    assert out[1]["concept_id"] == 201
    assert text[out[1]["start"] : out[1]["end"]] == "right fendex"
    # no extension table entry -> unchanged
    out2 = extend_laterality(text, spans, {})
    assert out2[0]["concept_id"] == 100 and out2[0]["start"] == 11


def test_greedy_key_selection_g4():
    keys = [
        ("good", 10, 0),      # precision 1.0
        ("ok", 8, 2),         # 0.8
        ("bad", 1, 9),        # 0.1 — would drag running precision under
        ("mid", 5, 1),        # 0.83
    ]
    picked = dict_train.greedy_key_selection(keys, min_precision=0.8)
    assert picked[0] == "good"
    assert "bad" not in picked
    assert set(picked) == {"good", "mid", "ok"}
    # stricter threshold prunes more
    strict = dict_train.greedy_key_selection(keys, min_precision=0.95)
    assert strict == ["good"]
    assert dict_train.greedy_key_selection([], 0.9) == []
