"""Vectorized rolling-hash matcher ≡ Aho-Corasick matcher (the two
MentionExtractor modes must be byte-identical on every input class:
multiword, hyphen/double-space variants, trailing plurals, nested
surfaces, 's'-ending surfaces, non-ASCII docs, empty docs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from snomed_ct_entity_linking_ray import fixtures
from snomed_ct_entity_linking_ray.functions.vecmatch import (
    VecDict,
    _poly_hash_str,
    match_ascii_batch,
)
from snomed_ct_entity_linking_ray.pipelines import entity_link as el

SF = "/root/testdata/sf0.001"

SURFACES = sorted(
    [
        "pain",
        "card oss",
        "cardoss",
        "oss",                 # 's'-ending surface
        "card oss trophy",
        "neur algia",
        "s",                   # degenerate single-letter
        "glyc",
        "glycs",               # explicit plural-looking surface
    ]
)

TEXTS = [
    "Chief Complaint:\nthe patient has card oss and pain today.\n",
    "History:\nsevere card-oss with CARD  OSS noted, also cardosss.\n",  # hyphen, double space, plural
    "Notes:\nglyc glycs osss neur algia card oss trophy here.\n",
    "",                        # empty doc
    "Impression:\ncafé pain résumé card oss.\n",  # non-ASCII doc
    "no mentions here at all truly\n",
]


def _extract(matcher: str):
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(TEXTS))]),
            "text": pa.array(TEXTS),
        }
    )
    ext = el.MentionExtractor(ray.put(VecDict(SURFACES)), None, matcher)
    return ext(batch).to_pandas()


def test_vector_equals_automaton_handbuilt():
    a = _extract("automaton").reset_index(drop=True)
    v = _extract("vector").reset_index(drop=True)
    assert len(a) > 5  # the scenarios actually fire
    import pandas as pd

    pd.testing.assert_frame_equal(a, v)


def test_vector_equals_automaton_on_fixture():
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(SF))
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.functions.docs import flatten_batch

    docs = flatten_batch(pq.read_table(f"{fdir}/docs.parquet"))
    state = el.build_link_state(fdir)
    ref = ray.put(state["vecdict"])
    batch = pa.table({"doc_id": docs["doc_id"], "text": docs["text"]})
    a = el.MentionExtractor(ref, None, "automaton")(batch).to_pandas()
    v = el.MentionExtractor(ref, None, "vector")(batch).to_pandas()
    import pandas as pd

    assert len(a) > 100
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), v.reset_index(drop=True)
    )


def test_poly_hash_window_identity():
    """Window-extension hash algebra equals direct string hashing."""
    vd = VecDict(["alpha beta gamma"])
    doc, start, end, sid, plural = match_ascii_batch(
        ["xx alpha   beta-gamma yy"], vd
    )
    assert list(doc) == [0]
    assert list(start) == [3] and list(end) == [21]
    assert not plural[0]
    assert _poly_hash_str("alpha beta gamma") == vd.hashes_sorted[0]


def test_plural_absorbed_span():
    vd = VecDict(["card oss"])
    doc, start, end, sid, plural = match_ascii_batch(["a card osss b"], vd)
    # one extra trailing 's' absorbed into the span; two extra = no match
    assert list(start) == [2] and list(end) == [11] and plural[0]
    d2, *_ = match_ascii_batch(["a card ossss b"], vd)
    assert len(d2) == 0


def test_encoder_artifact_roundtrip(tmp_path):
    """A2/A3 weights path: artifact saves once, loads in a fresh encoder,
    and the forward pass is deterministic + mean-pool/L2 semantics hold."""
    import numpy as np

    from snomed_ct_entity_linking_ray.functions import encoder as enc_mod

    path = str(tmp_path / "enc.pkl")
    enc_mod.ensure_encoder_artifact(path)
    assert enc_mod.ensure_encoder_artifact(path) == path  # write-once

    e1 = enc_mod.NumpyEncoder(path)
    e2 = enc_mod.NumpyEncoder(path)
    texts = ["severe chest pain", "chest pain", "", "one " * 60]
    a, b = e1.encode(texts), e2.encode(texts)
    np.testing.assert_array_equal(a, b)
    # unit rows
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-12)
    # truncation at MAX_TOKENS: 60 repeated tokens == 25 repeated tokens
    c = e1.encode(["one " * 25])
    np.testing.assert_array_equal(a[3], c[0])
    # batch layout independence: encoding alone == encoding in a batch
    np.testing.assert_array_equal(e1.encode(["chest pain"])[0], a[1])
