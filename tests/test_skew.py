"""Skew stress: one giant (lang, source) block through the pairwise dedup
path must hit ``_cap_block``'s deterministic keep-lowest-id drop, stay
bounded, and stay correct on the kept subset (VERDICT r2 optional item)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from snomed_ct_entity_linking_ray.functions.text import char_set_jaccard_batch
from snomed_ct_entity_linking_ray.pipelines.dedup import q_ngram_jaccard_pairs


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    """360 docs, ALL in one (lang, source) hot block; texts drawn from a
    3-letter alphabet so char-set Jaccard collisions are plentiful."""
    rng = np.random.default_rng(11)
    alph = np.array(list("abc xyz"))
    texts = ["".join(rng.choice(alph, size=12)) for _ in range(360)]
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(360, dtype=np.int64),
                "text": texts,
                "lang": ["en"] * 360,
                "source": ["hot"] * 360,
                "n_chars": [len(t) for t in texts],
            }
        ),
        d / "documents.parquet",
    )
    return str(d), texts


def test_hot_block_is_capped_and_deterministic(ray_session, skewed_dir):
    d, texts = skewed_dir
    cap = 50
    out = (
        q_ngram_jaccard_pairs(d, threshold=0.6, block_cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # drop policy: only the cap lowest doc_ids survive into pair generation
    assert out["doc_a"].max() < cap and out["doc_b"].max() < cap
    # exact parity with a naive all-pairs pass over the kept subset
    kept = texts[:cap]
    want = []
    for i in range(cap):
        for j in range(i + 1, cap):
            if char_set_jaccard_batch(
                np.array([kept[i]], object), np.array([kept[j]], object)
            )[0] >= 0.6:
                want.append((i, j))
    got = list(zip(out["doc_a"], out["doc_b"]))
    assert got == want and len(want) > 0
    # re-run: same capped result (deterministic under skew)
    out2 = (
        q_ngram_jaccard_pairs(d, threshold=0.6, block_cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
