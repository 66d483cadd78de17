"""Training-data prep family: unit + property tests beyond the driver-gate
parity checks in test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from snomed_ct_entity_linking_ray.functions.quality import (
    QUALITY_DIM,
    QualityModel,
    build_quality_weights,
    ensure_quality_artifact,
    feature_ids,
)
from snomed_ct_entity_linking_ray.pipelines.training import (
    PACK_PART_DOCS,
    _ngrams,
    q_pack_sequences,
)

SF = "/root/testdata/sf0.01"


def _naive_ngrams(texts, ids, n):
    rows = []
    for i, t in zip(ids, texts):
        ws = t.split(" ")
        for j in range(len(ws) - n + 1):
            rows.append((i, " ".join(ws[j : j + n])))
    return rows


@pytest.mark.parametrize("n", [2, 3, 5])
def test_ngrams_matches_naive(n):
    texts = [
        "a b c d e",
        "x",                      # shorter than n
        "p q",                    # boundary at n=2
        "m m m m m m m m",
        "",                       # single empty token
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = _ngrams(df, n)
    want = _naive_ngrams(texts, df["doc_id"], n)
    assert list(zip(got["doc_id"], got["gram"])) == want


def test_ngrams_empty_batch():
    df = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                       "text": pd.Series([], dtype=object)})
    out = _ngrams(df, 3)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "gram"]


def test_feature_ids_deterministic_and_bounded():
    grams = ["a b", "b c", "a b", "zz yy"]
    f1, f2 = feature_ids(grams), feature_ids(grams)
    assert (f1 == f2).all()
    assert f1[0] == f1[2]  # same gram → same feature
    assert ((f1 >= 0) & (f1 < QUALITY_DIM)).all()


def test_quality_model_scatter_matches_loop():
    ensure_quality_artifact()
    m = QualityModel()
    w = build_quality_weights()
    assert (m.w_q == w["w_q"]).all() and m.b_q == w["b_q"]
    rng = np.random.default_rng(7)
    row = rng.integers(0, 5, size=40).astype(np.int64)
    feat = rng.integers(0, QUALITY_DIM, size=40).astype(np.int64)
    got = m.score(row, feat, 5)
    want = np.full(5, m.b_q, dtype=np.int64)
    for r, f in zip(row, feat):
        want[r] += m.w_q[f]
    assert (got == want).all()


def test_pack_sequences_prefix_scan_invariants(ray_session):
    out = q_pack_sequences(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # global layout: each doc starts exactly where the previous one ended
    start = out["token_start"].to_numpy()
    n = out["n_tokens"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()
    # window spans consistent with the 256-token grid
    assert (out["first_window"] == start // 256).all()
    assert (out["last_window"] == (start + n - 1) // 256).all()
    # every doc in exactly one range partition of the scan
    assert out["doc_id"].is_unique
    assert (n >= 1).all()


def test_pack_sequences_spans_multiple_parts(ray_session, tmp_path):
    """Force >1 scan partition: synthetic docs crossing PACK_PART_DOCS."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.array([0, 1, PACK_PART_DOCS, PACK_PART_DOCS + 1, 2 * PACK_PART_DOCS],
                   dtype=np.int64)
    texts = ["w " * (i + 1) for i in range(len(ids))]
    texts = [t.strip() for t in texts]
    pq.write_table(
        pa.table({"doc_id": ids, "text": texts,
                  "lang": ["en"] * 5, "source": ["s"] * 5,
                  "n_chars": [len(t) for t in texts]}),
        tmp_path / "documents.parquet",
    )
    out = (
        q_pack_sequences(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc_id order defines the stream even across partitions
    start = out["token_start"].to_numpy()
    n = out["n_tokens"].to_numpy()
    assert start[0] == 0 and (start[1:] == start[:-1] + n[:-1]).all()
    assert (n == np.arange(1, 6)).all()


def test_crc32_windows_bit_equal_zlib():
    import zlib
    from snomed_ct_entity_linking_ray.functions.hashing import crc32_windows

    rng = np.random.default_rng(5)
    for k in (3, 4, 5, 8):
        buf = rng.integers(0, 256, size=300, dtype=np.uint8)
        got = crc32_windows(buf, k)
        raw = buf.tobytes()
        want = [zlib.crc32(raw[i : i + k]) for i in range(len(raw) - k + 1)]
        assert got.tolist() == want


def test_signatures_batch_bit_equal_per_doc():
    from snomed_ct_entity_linking_ray.functions.hashing import (
        MinHasher,
        shingle_hashes,
    )

    rng = np.random.default_rng(6)
    mh = MinHasher()
    texts = [
        "".join(rng.choice(list("abcdef "), size=int(n)))
        for n in rng.integers(1, 200, size=500)
    ]
    hs = [shingle_hashes(t) for t in texts]
    flat = np.concatenate(hs)
    offs = np.concatenate(([0], np.cumsum([len(h) for h in hs]))).astype(np.int64)
    got = mh.signatures_batch(flat, offs)
    want = np.stack([mh.signature(h) for h in hs])
    assert (got == want).all()


def test_simhasher_batch_bit_equal_per_doc():
    from snomed_ct_entity_linking_ray.functions.hashing import SimHasher, simhash64

    rng = np.random.default_rng(8)
    vocab = ["a", "bb", "ccc", "dd d", "ee", "zz", ""]
    docs = [
        [vocab[i] for i in rng.integers(0, len(vocab), size=int(n))]
        for n in rng.integers(1, 50, size=300)
    ]
    flat = np.array([t for d in docs for t in d], dtype=object)
    offs = np.concatenate(([0], np.cumsum([len(d) for d in docs])))
    sh = SimHasher()
    got = sh.batch(flat, offs)
    want = np.array([simhash64(d) for d in docs], dtype=np.uint64)
    assert (got == want).all()
    # second call exercises the warm cache path
    assert (sh.batch(flat, offs) == want).all()


def test_decontaminate_empty_eval_split(ray_session, tmp_path):
    """No doc_id % 97 == 0 docs → empty broadcast set → zero rows, no error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines.training import q_decontaminate

    ids = np.array([1, 2, 3, 98, 99], dtype=np.int64)  # none divisible by 97
    pq.write_table(
        pa.table({"doc_id": ids, "text": ["a b c d"] * 5,
                  "lang": ["en"] * 5, "source": ["s"] * 5,
                  "n_chars": [7] * 5}),
        tmp_path / "documents.parquet",
    )
    out = q_decontaminate(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_heavy_hitters_skewed(ray_session, tmp_path):
    """A genuinely skewed corpus: one word holds >1/30 of tokens and must
    surface with its exact count despite MG compression en route."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines.training import q_heavy_hitters

    rng = np.random.default_rng(4)
    texts = []
    for i in range(200):
        toks = [f"w{int(x)}" for x in rng.integers(0, 120, size=50)]
        if i % 2 == 0:
            toks[:10] = ["hot"] * 10  # 'hot' ≈ 10% of all tokens
        texts.append(" ".join(toks))
    ids = np.arange(200, dtype=np.int64)
    pq.write_table(
        pa.table({"doc_id": ids, "text": texts, "lang": ["en"] * 200,
                  "source": ["s"] * 200, "n_chars": [len(t) for t in texts]}),
        tmp_path / "documents.parquet",
    )
    out = q_heavy_hitters(str(tmp_path))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    # exact ground truth
    from collections import Counter
    c = Counter(t for s in texts for t in s.split(" "))
    total = sum(c.values())
    want = sorted((w, n) for w, n in c.items() if n * 30 > total)
    assert list(zip(out["word"], out["n"])) == want
    assert ("hot", c["hot"]) in want


def test_decontaminate_bloom_branch_superset(ray_session):
    """Force the Bloom plan (max_broadcast=0): no false negatives — every
    exact contamination row appears with the SAME count (Bloom can only
    add spurious rows / inflate counts, never lose one)."""
    from snomed_ct_entity_linking_ray.pipelines.training import q_decontaminate

    exact = (
        q_decontaminate(SF)
        .to_pandas()
        .set_index("doc_id")["n_contaminated"]
        .sort_index()
    )
    bloom = (
        q_decontaminate(SF, max_broadcast=0)
        .to_pandas()
        .set_index("doc_id")["n_contaminated"]
        .sort_index()
    )
    assert set(exact.index) <= set(bloom.index)
    joined = bloom.reindex(exact.index)
    assert (joined >= exact).all()
    # at 16 bits/key + 8 probes the FP rate is ~6e-4: expect near-identity
    extra = len(bloom) - len(exact)
    assert extra <= max(5, len(exact) // 10), f"too many Bloom FPs: {extra}"


def test_bloom_kernels_roundtrip():
    from snomed_ct_entity_linking_ray.pipelines.training import (
        _bloom_build,
        _bloom_probe,
    )

    grams = pd.Series([f"g{i} h{i} k{i}" for i in range(1000)], dtype=object)
    bits = _bloom_build(grams, 1 << 15)
    assert _bloom_probe(grams, bits).all()  # zero false negatives
    other = pd.Series([f"x{i} y{i} z{i}" for i in range(5000)], dtype=object)
    fp = _bloom_probe(other, bits).mean()
    assert fp < 0.05, fp


def test_week_truncation_formula_matches_duckdb():
    """The int64 Monday-truncation used by cohort_retention is bit-equal
    to DuckDB date_trunc('week') across positive epoch days."""
    import duckdb

    rng = np.random.default_rng(9)
    us = rng.integers(0, 2_000_000_000, size=500).astype("int64") * 10**6
    df = pd.DataFrame({"ts": pd.Series(us.astype("datetime64[us]"))})
    d = us // (86400 * 10**6)
    got = d - ((d + 3) % 7)
    con = duckdb.connect()
    want = con.execute(
        "SELECT CAST(CAST(epoch(date_trunc('week', ts)) AS BIGINT) // 86400 "
        "AS BIGINT) AS t FROM df",
    ).df()["t"]
    assert (got == want.to_numpy()).all()


def test_grouped_median_single_value_groups(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines.relational import q_grouped_median

    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(3, dtype=np.int64),
                "ts": pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]"),
                "user_id": np.array([1, 2, 3], dtype=np.int64),
                "event_type": ["a", "a", "b"],
                "value": [1.0, 3.0, 5.0],
                "props": ['{"k": 1}'] * 3,
            }
        ),
        tmp_path / "events.parquet",
    )
    out = (
        q_grouped_median(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # percentile_disc(0.5) of {100, 300} -> 100 (k = ceil(0.5*2) = 1)
    assert out["p50_value_cents"].tolist() == [100, 500]
    assert out["n"].tolist() == [2, 1]
