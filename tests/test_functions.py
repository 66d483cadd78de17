"""Unit tests for pure kernels: normalizer, sections, overlaps, automaton,
similarity (property-checked against DuckDB), hashing."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from snomed_ct_entity_linking_ray.functions import overlaps, sections, text
from snomed_ct_entity_linking_ray.functions.similarity import (
    hash_embed,
    jaro_winkler,
    levenshtein,
)
from snomed_ct_entity_linking_ray.functions import hashing
from snomed_ct_entity_linking_ray.state.automaton import AhoCorasick


def test_normalize_text_m17():
    assert text.normalize_text("  Heart--Attack!!  ") == "heart attack"
    assert text.normalize_text("A/B c") == "a b c"
    arr = pa.array(["  Heart--Attack!!  ", "A/B c", "x"])
    assert text.normalize_array(arr).to_pylist() == ["heart attack", "a b c", "x"]


def test_tolerant_pattern_m1():
    pat = text.tolerant_pattern("heart attack")
    assert pat.search("heart  attack")
    assert pat.search("heart-attack")
    assert pat.fullmatch("heart attacks")


def test_sections():
    t = "Chief Complaint:\nchest pain.\nAllergies:\nnone known.\n"
    secs = sections.find_sections(t)
    assert [s[0] for s in secs] == ["Chief Complaint", "Allergies"]
    idx = sections.SectionIndex(secs)
    assert idx.header_at(20) == "Chief Complaint"
    assert idx.header_at(len(t) - 1) == "Allergies"
    # leading text before any header -> "other"
    secs2 = sections.find_sections("preamble\n" + t)
    assert secs2[0][0] == "other"


def test_remove_overlaps_d2():
    spans = [
        {"start": 0, "end": 10, "concept_id": 1},
        {"start": 5, "end": 8, "concept_id": 2},
        {"start": 20, "end": 25, "concept_id": 3},
    ]
    kept = overlaps.remove_overlaps(spans)
    assert [(s["start"], s["end"]) for s in kept] == [(0, 10), (20, 25)]
    # generic penalty: equal length, section-specific wins
    spans = [
        {"start": 0, "end": 5, "concept_id": 1, "generic": True},
        {"start": 0, "end": 5, "concept_id": 2, "generic": False},
    ]
    kept = overlaps.remove_overlaps(spans)
    assert len(kept) == 1 and kept[0]["concept_id"] == 2
    # re-add pass: dropped span that no longer overlaps re-enters
    spans = [
        {"start": 0, "end": 4, "concept_id": 1},
        {"start": 2, "end": 12, "concept_id": 2},
        {"start": 3, "end": 6, "concept_id": 3},
    ]
    kept = overlaps.remove_overlaps(spans)
    starts = [(s["start"], s["end"]) for s in kept]
    assert (2, 12) in starts and (0, 4) not in starts or (2, 12) not in starts
    # no overlaps in output, always
    for a in kept:
        for b in kept:
            if a is not b:
                assert not (a["start"] < b["end"] and b["start"] < a["end"])


def test_automaton_matches_regex_oracle():
    rng = random.Random(3)
    vocab = ["pain", "chest pain", "heart", "heart attack", "art", "ttack"]
    pats = {p: i for i, p in enumerate(vocab)}
    ac = AhoCorasick(pats)
    import re

    for _ in range(50):
        words = [rng.choice(vocab + ["x", "zz", "qq"]) for _ in range(rng.randint(1, 12))]
        t = " ".join(words)
        got = set(ac.find_words(t))
        want = set()
        for p, pid in pats.items():
            for m in re.finditer(r"(?<![a-zA-Z0-9])" + re.escape(p) + r"(?![a-zA-Z0-9])", t):
                want.add((m.start(), m.end(), pid))
        assert got == want, (t, got, want)


def test_similarity_matches_duckdb():
    con = duckdb.connect()
    rng = random.Random(1)
    ws = ["martha", "marhta", "pain", "pains", "abc"] + [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 10))).strip() or "q"
        for _ in range(40)
    ]
    L = [rng.choice(ws) for _ in range(200)]
    R = [rng.choice(ws) for _ in range(200)]
    duck = con.execute(
        "SELECT jaccard(l,r), levenshtein(l,r), jaro_winkler_similarity(l,r) "
        "FROM (SELECT unnest(?) l, unnest(?) r)",
        [L, R],
    ).fetchall()
    jac = text.char_set_jaccard_batch(np.array(L, object), np.array(R, object))
    for (dj, dl, dw), a, b, j in zip(duck, L, R, jac):
        assert dl == levenshtein(a, b)
        assert abs(dw - jaro_winkler(a, b)) < 1e-12
        assert abs(dj - j) < 1e-12


def test_hash_embed_deterministic():
    e1 = hash_embed(["chest pain", "heart attack"])
    e2 = hash_embed(["chest pain", "heart attack"])
    np.testing.assert_array_equal(e1, e2)
    assert abs(np.linalg.norm(e1[0]) - 1.0) < 1e-12
    # identical strings -> cosine 1; different -> < 1
    assert e1[0] @ e1[0] == pytest.approx(1.0)
    assert e1[0] @ e1[1] < 0.99


def test_minhash_lsh_properties():
    mh = hashing.MinHasher(num_perm=64)
    a = hashing.shingle_hashes("the quick brown fox jumps over the lazy dog")
    b = hashing.shingle_hashes("the quick brown fox jumped over the lazy dog")
    c = hashing.shingle_hashes("completely different content here")
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.6 > sim_ac
    assert len(mh.band_keys(sa, bands=16)) == 16
    assert set(mh.band_keys(sa, 16)) & set(mh.band_keys(sb, 16))


def test_simhash():
    a = hashing.simhash64("the quick brown fox".split())
    b = hashing.simhash64("the quick brown foxes".split())
    c = hashing.simhash64("unrelated words entirely now".split())
    assert hashing.hamming64(a, b) < hashing.hamming64(a, c)


def test_md5_fingerprint_matches_duckdb():
    con = duckdb.connect()
    for s in ["hello", "chest pain", ""]:
        assert hashing.md5_hex(s) == con.execute("select md5(?)", [s]).fetchone()[0]


def test_band_key_ints_equiv():
    """band_key_ints is an injective re-encoding of band_keys: same bucket
    membership for any pair of signatures."""
    import numpy as np

    from snomed_ct_entity_linking_ray.functions import hashing

    mh = hashing.MinHasher(num_perm=64)
    rng = np.random.default_rng(3)
    sigs = [rng.integers(0, 1 << 60, 64, dtype=np.uint64) for _ in range(20)]
    # make some signatures share bands
    sigs[5][:4] = sigs[0][:4]
    sigs[7] = sigs[1].copy()
    for bands in (8, 16):
        for s in sigs:
            ks = mh.band_keys(s, bands)
            ki = mh.band_key_ints(s, bands)
            assert len(ks) == len(ki) == bands
        for a in sigs:
            for b in sigs:
                same_str = [x == y for x, y in zip(mh.band_keys(a, bands), mh.band_keys(b, bands))]
                same_int = [x == y for x, y in zip(mh.band_key_ints(a, bands), mh.band_key_ints(b, bands))]
                assert same_str == same_int


# --- HLL sketch kernels (functions/sketches.py) ---------------------------

def test_hll_registers_match_scalar_rank_rule():
    """Vectorized register build == per-value Python rule (idx = top p
    bits, rank = clz of remainder + 1, capped)."""
    import numpy as np

    from snomed_ct_entity_linking_ray.functions import sketches

    h = sketches.splitmix64(np.arange(5000, dtype=np.uint64))
    regs = sketches.hll_registers(h)
    expect = [0] * sketches.HLL_M
    for v in h:
        v = int(v)
        idx = v >> (64 - sketches.HLL_P)
        w = (v << sketches.HLL_P) & ((1 << 64) - 1)
        rank = min(
            (65 - w.bit_length()) if w else 65, 64 - sketches.HLL_P + 1
        )
        expect[idx] = max(expect[idx], rank)
    assert regs.tolist() == expect


def test_hll_merge_equals_single_pass_and_estimate_accuracy():
    import numpy as np

    from snomed_ct_entity_linking_ray.functions import sketches

    vals = np.arange(100_000, dtype=np.uint64)
    h = sketches.splitmix64(vals)
    whole = sketches.hll_registers(h)
    # merge of arbitrary partials == single pass (order-independence)
    parts = [sketches.hll_registers(c) for c in np.array_split(h, 7)]
    merged = parts[0]
    for p in parts[1:]:
        merged = sketches.hll_merge(merged, p)
    assert np.array_equal(whole, merged)
    est = sketches.hll_estimate(whole)
    assert abs(est - 100_000) / 100_000 < 0.05  # ~1.6% expected at p=12


def test_soundex_classic_vectors():
    """NARA American Soundex: the published reference codes, plus the
    h/w-separator and vowel-reset rules, and the letters-only multi-word
    behavior q_phonetic_pairs relies on."""
    from snomed_ct_entity_linking_ray.functions.similarity import soundex

    for name, code in [
        ("Robert", "R163"), ("Rupert", "R163"),
        ("Ashcraft", "A261"), ("Ashcroft", "A261"),  # h does not separate
        ("Tymczak", "T522"),                          # vowel separates
        ("Pfister", "P236"), ("Honeyman", "H555"),
        ("small ring", "S546"),                       # letters-only join
        ("", "0000"), ("123", "0000"),
    ]:
        assert soundex(name) == code, (name, soundex(name), code)
