"""Property-based tests (hypothesis) for the invariant-critical kernels:
overlap resolution, similarity-vs-DuckDB exactness, automaton matching,
offset remap round-trips."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from snomed_ct_entity_linking_ray.functions.overlaps import remove_overlaps
from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler, levenshtein
from snomed_ct_entity_linking_ray.functions.text import (
    char_set_jaccard_batch,
    normalize_text,
)
from snomed_ct_entity_linking_ray.state.automaton import AhoCorasick

_spans = st.lists(
    st.tuples(st.integers(0, 200), st.integers(1, 30), st.integers(1, 9)).map(
        lambda t: {"start": t[0], "end": t[0] + t[1], "concept_id": t[2]}
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=200, deadline=None)
@given(_spans)
def test_remove_overlaps_invariants(spans):
    kept = remove_overlaps(spans)
    # pairwise non-overlapping
    for i, a in enumerate(kept):
        for b in kept[i + 1 :]:
            assert not (a["start"] < b["end"] and b["start"] < a["end"])
    # kept ⊆ input
    key = {(s["start"], s["end"], s["concept_id"]) for s in spans}
    assert all((k["start"], k["end"], k["concept_id"]) in key for k in kept)
    # maximality: no dropped span could be re-added
    for s in spans:
        if (s["start"], s["end"], s["concept_id"]) not in {
            (k["start"], k["end"], k["concept_id"]) for k in kept
        }:
            assert any(
                s["start"] < k["end"] and k["start"] < s["end"] for k in kept
            )
    # determinism
    assert remove_overlaps(list(reversed(spans))) == kept


_word = st.text(alphabet="abcdef ", min_size=1, max_size=14).map(
    lambda s: s.strip() or "x"
)


@settings(max_examples=150, deadline=None)
@given(_word, _word)
def test_similarity_bit_exact_vs_duckdb(a, b):
    con = duckdb.connect()
    dj, dl, dw = con.execute(
        "select jaccard(?,?), levenshtein(?,?), jaro_winkler_similarity(?,?)",
        [a, b, a, b, a, b],
    ).fetchone()
    assert dl == levenshtein(a, b)
    assert abs(dw - jaro_winkler(a, b)) < 1e-12
    assert abs(dj - char_set_jaccard_batch(np.array([a], object), np.array([b], object))[0]) < 1e-12


_vocab = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=8, unique=True
)
_text = st.text(alphabet="abc ", min_size=0, max_size=60)


@settings(max_examples=150, deadline=None)
@given(_vocab, _text)
def test_automaton_matches_bruteforce(vocab, text):
    ac = AhoCorasick({w: i for i, w in enumerate(vocab)})
    got = set(ac.find_all(text))
    want = set()
    for i, w in enumerate(vocab):
        start = 0
        while True:
            j = text.find(w, start)
            if j < 0:
                break
            want.add((j, j + len(w), i))
            start = j + 1
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="aB -/.!3", min_size=0, max_size=40))
def test_normalize_idempotent(s):
    n = normalize_text(s)
    assert normalize_text(n) == n
    assert n == n.strip()
    assert "  " not in n


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50
    )
)
@settings(max_examples=30, deadline=None)
def test_stratified_mixer_bit_exact_vs_duckdb(ids):
    """The sample_stratified mixer must compute identically in numpy int64
    and SQL BIGINT for any non-negative doc_id (all intermediates < 2^51,
    so neither side overflows)."""
    import duckdb

    arr = np.asarray(ids, dtype=np.int64)
    mine = ((arr % 1000003) * 2654435761) % 1000000007 % 1000
    got = duckdb.sql(
        "SELECT ((i % 1000003) * 2654435761) % 1000000007 % 1000 AS h "
        "FROM (SELECT unnest(?::BIGINT[]) AS i)",
        params=[list(map(int, ids))],
    ).fetchnumpy()["h"]
    assert mine.tolist() == got.tolist()


@given(st.text(min_size=0, max_size=120))
@settings(max_examples=150, deadline=None)
def test_winnow_fingerprints_bit_equal_plain_loop(s):
    """The vectorized winnowing kernel is bit-equal to the plain
    per-window Horner loop (the oracle's implementation)."""
    from snomed_ct_entity_linking_ray.functions.hashing import (
        WINNOW_BASE,
        winnow_fingerprints,
    )

    def plain(text, window=12, mod_bits=4):
        enc = text.encode("utf-8")
        if not enc:
            return [0]
        w = min(window, len(enc))
        B, M = int(WINNOW_BASE), 1 << 64
        hs = []
        for i in range(len(enc) - w + 1):
            h = 0
            for c in enc[i : i + w]:
                h = (h * B + c) % M
            hs.append(h)
        sel = sorted({h for h in hs if (h & ((1 << mod_bits) - 1)) == 0})
        return sel or [min(hs)]

    assert winnow_fingerprints(s).tolist() == plain(s)


_tokens = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=4
)


@settings(max_examples=100, deadline=None)
@given(_tokens, _tokens)
def test_monge_elkan_micro_bit_exact_vs_duckdb(ta, tb):
    """The directed quantize-then-sum Monge-Elkan contract: per a-token
    best JW rounded half-even to 1e-6 BEFORE the integer sum — the exact
    expression q_monge_elkan_pairs' DuckDB oracle computes."""
    from snomed_ct_entity_linking_ray.functions.similarity import monge_elkan_micro

    con = duckdb.connect()
    total = 0
    for t in ta:
        best = max(
            con.execute(
                "select jaro_winkler_similarity(?,?)", [t, u]
            ).fetchone()[0]
            for u in tb
        )
        total += int(np.rint(best * 1e6))
    assert monge_elkan_micro(ta, tb) == total


_ints = st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=60)


@settings(max_examples=150, deadline=None)
@given(_ints)
def test_quantile_disc_rank_semantics_vs_duckdb(vals):
    """Pin q_exact_quantiles' rank contract: DuckDB quantile_disc(v, q)
    == the ceil(q*n)-th smallest (1-indexed), for the exact q values the
    operator ships. The distributed plan depends on this identity at the
    driver's target-bin walk."""
    import math

    con = duckdb.connect()
    s = sorted(vals)
    n = len(vals)
    for q in (0.5, 0.9, 0.99):
        d = con.execute(
            "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)", [q, vals]
        ).fetchone()[0]
        assert d == s[max(1, math.ceil(q * n)) - 1], (q, n, d)
