"""Unit tests for the remaining SURVEY.md §2 operator ports: expanders
(M7-M10), offset remap (cut_headers), interval anti-join (J7), char-IoU
metric (G9), multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from snomed_ct_entity_linking_ray.functions import expanders, offsets
from snomed_ct_entity_linking_ray.functions.metrics import iou_per_concept, macro_iou
from snomed_ct_entity_linking_ray.functions.overlaps import interval_anti_join


def test_synonym_gate_m7():
    assert expanders.synonym_gate("heart attack")
    assert not expanders.synonym_gate("ab")
    assert not expanders.synonym_gate("[bracketed] thing")
    assert not expanders.synonym_gate("bad machine translation result")
    assert not expanders.synonym_gate("a b c d e f g")  # too many words


def test_word_permutations_m8():
    assert expanders.word_permutations("loss of vision") == ["vision loss"]
    assert expanders.word_permutations("heart attack") == ["attack heart"]
    perms = expanders.word_permutations("acute kidney injury")
    assert "kidney acute injury" in perms and len(perms) == 5
    assert expanders.word_permutations("pain with movement now") == []  # blacklist


def test_word_replacements_m9():
    out = expanders.word_replacements("mitral valve prolapse")
    assert "mitral prolapse" in out
    assert "loss of the vision" in expanders.word_replacements("loss of vision")


def test_uppercase_fraction_m10():
    assert expanders.uppercase_fraction(["COPD", "COPD", "COPD"]) == 1.0
    assert expanders.uppercase_fraction(["COPD", "copd"]) == 0.5


def test_remap_spans_after_cut():
    # text "aaaa[BBBB]cccc" with [4,8) removed: span at 10..12 shifts to 6..8
    cuts = [(4, 8)]
    spans = [(0, 3), (10, 12), (5, 7), (2, 6)]
    out = offsets.remap_spans_after_cut(cuts, spans)
    assert out == [(0, 3), (6, 8), None, None]
    # two cuts accumulate
    out2 = offsets.remap_spans_after_cut([(0, 2), (4, 6)], [(8, 10)])
    assert out2 == [(4, 6)]


def test_fix_trailing_space():
    assert offsets.fix_trailing_space("ab cd ", 2, 6) == (3, 5)
    assert offsets.fix_trailing_space("  ", 0, 2) == (2, 2)


def test_interval_anti_join_j7():
    model = [(0, 5), (10, 20)]
    static = [(4, 6), (8, 9), (15, 16), (25, 30)]
    kept = interval_anti_join(static, model)
    assert kept == [(8, 9), (25, 30)]
    assert interval_anti_join([(0, 1)], []) == [(0, 1)]


def test_iou_metric_g9():
    gold = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": ["d1", "d1", "d2"],
                "start": [0, 10, 0],
                "end": [4, 14, 10],
                "concept_id": [1, 2, 1],
            }
        )
    )
    pred = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": ["d1", "d1", "d2"],
                "start": [0, 10, 0],
                "end": [4, 12, 5],
                "concept_id": [1, 2, 1],
            }
        )
    )
    per = iou_per_concept(pred, gold).to_pandas().set_index("concept_id")
    # concept 1: d1 exact (4/4) + d2 half (5/10) → (4+5)/(4+10)
    assert per.loc[1, "iou"] == pytest.approx(9 / 14)
    # concept 2: 2/4
    assert per.loc[2, "iou"] == pytest.approx(0.5)
    assert macro_iou(iou_per_concept(pred, gold)) == pytest.approx((9 / 14 + 0.5) / 2)


def test_multimodal_plumbing():
    from snomed_ct_entity_linking_ray.pipelines import multimodal

    inv = multimodal.q_media_inventory("/root/testdata/sf0.001").to_pandas()
    assert len(inv) > 0
    assert set(["doc_id", "media_ref", "offset", "width", "height", "n_frames"]) <= set(
        inv.columns
    )
    assert (inv["width"] >= 64).all() and (inv["n_frames"] >= 1).all()
    # deterministic across runs
    inv2 = multimodal.q_media_inventory("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(
        inv.sort_values(["doc_id", "offset"]).reset_index(drop=True),
        inv2.sort_values(["doc_id", "offset"]).reset_index(drop=True),
    )
    frames = multimodal.q_frame_samples("/root/testdata/sf0.001").to_pandas()
    assert (frames["frame_idx"] % 30 == 0).all()


def test_media_decoder_real_mode_gated():
    from snomed_ct_entity_linking_ray.pipelines.multimodal import MediaDecoder

    with pytest.raises(NotImplementedError):
        MediaDecoder(mode="real")


def test_media_nearest_matches_naive():
    """Every mention's attached media span equals the naive per-doc
    argmin over (|offset-start|, offset, ref); media-free docs carry the
    ''/−1 sentinel; row count equals the gold mention count."""
    import pandas as pd

    from snomed_ct_entity_linking_ray import fixtures
    from snomed_ct_entity_linking_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf))
    gold = pd.read_parquet(f"{fdir}/gold_mentions.parquet")
    med = multimodal.media_rows(sf).to_pandas()
    by_doc = {d: g for d, g in med.groupby("doc_id")}

    got = multimodal.q_media_nearest(sf).to_pandas()
    assert len(got) == len(gold)
    # spot-check exhaustively (sf0.001 is small)
    for r in got.itertuples():
        g = by_doc.get(r.doc_id)
        if g is None or len(g) == 0:
            assert (r.media_ref, r.media_offset, r.dist) == ("", -1, -1)
            continue
        cand = sorted(
            (abs(int(o) - r.start), int(o), ref)
            for ref, o in zip(g["media_ref"], g["offset"])
        )
        d, o, ref = cand[0]
        assert (r.media_ref, r.media_offset, r.dist) == (ref, o, d)
