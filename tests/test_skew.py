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


def _prefix_filter_simulation(texts, threshold, cap):
    """Independent single-process mirror of the prefix-filtered blocking:
    global char document frequencies → rarest-first prefix keys → per-key
    keep-lowest-``cap`` ids → in-key all-pairs verify → distinct."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    df = Counter()
    for t in texts:
        df.update(set(t))
    rank = {c: i for i, c in enumerate(sorted(df, key=lambda c: (df[c], c)))}
    fr = Fraction(str(threshold))
    groups = defaultdict(list)
    for did, t in enumerate(texts):
        s = set(t)
        n = len(s)
        if n == 0:
            continue
        req = -((-fr.numerator * n) // fr.denominator)  # exact ceil(t·n)
        for c in sorted(s, key=rank.__getitem__)[: n - req + 1]:
            groups[rank[c]].append(did)
    pairs = set()
    for ids in groups.values():
        kept = sorted(ids)[:cap]
        for x in range(len(kept)):
            for y in range(x + 1, len(kept)):
                sim = char_set_jaccard_batch(
                    np.array([texts[kept[x]]], object),
                    np.array([texts[kept[y]]], object),
                )[0]
                if sim >= threshold:
                    pairs.add((kept[x], kept[y]))
    over_cap = any(len(ids) > cap for ids in groups.values())
    return pairs, over_cap


def test_hot_block_is_capped_and_deterministic(ray_session, skewed_dir):
    d, texts = skewed_dir
    cap = 50
    out = (
        q_ngram_jaccard_pairs(d, threshold=0.6, block_cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # exact parity with the independent prefix-filter + keep-lowest-id
    # simulation, on a fixture where the cap genuinely bites
    want, over_cap = _prefix_filter_simulation(texts, 0.6, cap)
    assert over_cap  # the hot block exceeds the cap in at least one key
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == want and len(want) > 0
    # capping dropped something vs the uncapped run
    full = q_ngram_jaccard_pairs(d, threshold=0.6).to_pandas()
    assert len(out) < len(full)
    assert got <= set(zip(full["doc_a"], full["doc_b"]))
    # re-run: same capped result (deterministic under skew)
    out2 = (
        q_ngram_jaccard_pairs(d, threshold=0.6, block_cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
