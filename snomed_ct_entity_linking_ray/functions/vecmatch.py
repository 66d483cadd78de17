"""Vectorized dictionary matcher over batches of ASCII text — the flagship
extraction fast path, semantically IDENTICAL to the Aho-Corasick path
(state/automaton.py) and tested equal against it.

Both reference matchers are word-bounded dictionary scans (M4 per-entry
regex, 1st Place/src/mimic_common.py:127-161; M18 alternation regex,
2nd Place/submission/static_dict.py:36-53). Over normalized text those
semantics reduce to: a dictionary surface matches exactly the token
sequences equal to it, plus a trailing-plural form where the last token
carries one extra ``s`` (M1 trailing ``s*``, mimic_common.py:50-71). That
reduction makes the scan expressible as pure array ops:

1. concatenate the batch's lowered texts into one byte buffer;
2. find ``[a-z0-9]+`` token runs with a numpy mask scan (no regex);
3. polynomial rolling hash (odd multiplier mod 2^64, so prefix hashes
   subtract/shift with the modular inverse — same public construction as
   Rabin-Karp / winnowing, cf. functions/hashing.py) of every token and of
   every k-token window, k ≤ the dictionary's max token count;
4. sorted-array membership (searchsorted) of window hashes against the
   precomputed surface hashes — plus the strip-one-trailing-``s`` variant;
5. string-verify the (few) hits, map back to per-doc char offsets.

Per-element work is all C; Python touches only per-doc section parsing and
verified hits. Non-ASCII docs are routed to the automaton path by the
caller (multi-byte UTF-8 would break the byte↔char offset equality).
"""

from __future__ import annotations

import numpy as np

P = np.uint64(1099511628211)  # odd ⇒ invertible mod 2^64
P_INV = np.uint64(pow(1099511628211, -1, 1 << 64))
_SPACE = np.uint64(32)
_S_BYTE = np.uint64(115)  # ord('s')

_ALNUM = np.zeros(256, dtype=bool)
for _c in range(ord("a"), ord("z") + 1):
    _ALNUM[_c] = True
for _c in range(ord("0"), ord("9") + 1):
    _ALNUM[_c] = True


def _poly_hash_str(s: str) -> np.uint64:
    """H(s) = sum_j byte_j * P^j (mod 2^64) — the zero-based segment hash
    ``match_ascii_batch`` computes for windows."""
    b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n == 0:
        return np.uint64(0)
    pw = np.empty(n, dtype=np.uint64)
    pw[0] = np.uint64(1)
    if n > 1:
        pw[1:] = np.cumprod(np.full(n - 1, P, dtype=np.uint64))
    return np.uint64((b * pw).sum(dtype=np.uint64))


class VecDict:
    """Driver-built dictionary side: surface poly-hashes sorted for
    searchsorted membership, surfaces kept for hit verification. Broadcast
    once via ``ray.put``; read-only in actors."""

    __slots__ = ("surfaces", "hashes_sorted", "sid_by_hash", "max_k", "prefilter")

    def __init__(self, surfaces: list[str]):
        self.surfaces = list(surfaces)
        hs = np.array([_poly_hash_str(s) for s in surfaces], dtype=np.uint64)
        order = np.argsort(hs, kind="stable")
        self.hashes_sorted = hs[order]
        self.sid_by_hash = order.astype(np.int32)
        if len(hs) > 1 and (np.diff(self.hashes_sorted) == 0).any():
            # ~2^-64 per pair; string verification would still be exact, but
            # duplicate hashes would need multi-candidate verify — keep the
            # invariant simple and loud instead.
            raise ValueError(
                "surface poly-hash collision; use the automaton matcher"
            )
        self.max_k = max((s.count(" ") + 1 for s in surfaces), default=1)
        # 16-bit membership prefilter: rejects ~(1 - |dict|/65536) of
        # candidate windows with one table gather before the (relatively
        # expensive) searchsorted — the dominant cost in profiling
        self.prefilter = np.zeros(1 << 16, dtype=bool)
        self.prefilter[(hs & np.uint64(0xFFFF)).astype(np.intp)] = True

    def lookup(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hit_mask, sid) for an array of candidate window hashes."""
        hit = np.zeros(len(hashes), dtype=bool)
        sid = np.zeros(len(hashes), dtype=np.int32)
        maybe = self.prefilter[(hashes & np.uint64(0xFFFF)).astype(np.intp)]
        if maybe.any():
            sub = hashes[maybe]
            idx = np.searchsorted(self.hashes_sorted, sub)
            idx_c = np.minimum(idx, len(self.hashes_sorted) - 1)
            hit[maybe] = (idx < len(self.hashes_sorted)) & (
                self.hashes_sorted[idx_c] == sub
            )
            sid[maybe] = self.sid_by_hash[idx_c]
        return hit, sid


def match_ascii_batch(
    texts: list[str], vd: VecDict
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Match a batch of ASCII texts against the dictionary.

    Returns (doc_idx, start, end, sid, plural) arrays over all matches, in
    emission order (caller sorts/filters). ``start``/``end`` are per-doc
    char offsets; matched spans are whole-token runs (boundary semantics of
    the automaton path, including the absorbed trailing plural ``s``).
    """
    empty = (
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int32),
        np.zeros(0, dtype=bool),
    )
    if not texts:
        return empty
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    doc_bounds = np.concatenate([[0], np.cumsum(lens)])
    big = "".join(t.lower() for t in texts)
    data = np.frombuffer(big.encode("ascii"), dtype=np.uint8)
    n = len(data)
    if n == 0:
        return empty

    # token runs of [a-z0-9]+ via mask scan
    mask = _ALNUM[data]
    d = np.diff(mask.astype(np.int8), prepend=np.int8(0), append=np.int8(0))
    tok_s = np.nonzero(d == 1)[0].astype(np.int64)
    tok_e = np.nonzero(d == -1)[0].astype(np.int64)
    T = len(tok_s)
    if T == 0:
        return empty
    tok_doc = np.searchsorted(doc_bounds, tok_s, side="right") - 1

    # prefix polynomial hashes: Pc[i] = sum_{j<i} data[j] * P^j
    pw = np.empty(n + 1, dtype=np.uint64)
    pw[0] = np.uint64(1)
    pw[1:] = np.cumprod(np.full(n, P, dtype=np.uint64))
    ipw = np.empty(n + 1, dtype=np.uint64)
    ipw[0] = np.uint64(1)
    ipw[1:] = np.cumprod(np.full(n, P_INV, dtype=np.uint64))
    Pc = np.empty(n + 1, dtype=np.uint64)
    Pc[0] = np.uint64(0)
    np.cumsum(data.astype(np.uint64) * pw[:n], out=Pc[1:])

    # zero-based hash of any [s,e) segment: (Pc[e]-Pc[s]) * P^-s
    tok_hash = (Pc[tok_e] - Pc[tok_s]) * ipw[tok_s]
    tok_len = (tok_e - tok_s).astype(np.uint64)
    tok_ends_s = data[tok_e - 1] == np.uint8(115)  # last char 's'

    out_doc: list[np.ndarray] = []
    out_start: list[np.ndarray] = []
    out_end: list[np.ndarray] = []
    out_sid: list[np.ndarray] = []
    out_plural: list[np.ndarray] = []

    win_hash = tok_hash.copy()
    win_len = tok_len.copy()
    for k in range(1, vd.max_k + 1):
        m = T - k + 1
        if m <= 0:
            break
        if k > 1:
            # window [i, i+k-1] = previous window + ' ' + token i+k-1
            t_h = tok_hash[k - 1 :]
            t_l = tok_len[k - 1 :]
            win_hash = win_hash[:m] + pw[win_len[:m]] * (_SPACE + P * t_h)
            win_len = win_len[:m] + np.uint64(1) + t_l
        valid = tok_doc[:m] == tok_doc[k - 1 :]
        last_slot = np.arange(k - 1, T)  # last token index per window

        # exact membership
        hit, sid = vd.lookup(win_hash)
        hit &= valid
        if hit.any():
            i = np.nonzero(hit)[0]
            out_doc.append(tok_doc[i])
            out_start.append(tok_s[i])
            out_end.append(tok_e[last_slot[i]])
            out_sid.append(sid[i])
            out_plural.append(np.zeros(len(i), dtype=bool))

        # trailing-plural membership: strip one final 's'
        can_strip = valid & tok_ends_s[k - 1 :] & (win_len > np.uint64(1))
        if can_strip.any():
            strip_hash = win_hash - pw[win_len - np.uint64(1)] * _S_BYTE
            hit_s, sid_s = vd.lookup(strip_hash)
            hit_s &= can_strip
            if hit_s.any():
                i = np.nonzero(hit_s)[0]
                out_doc.append(tok_doc[i])
                out_start.append(tok_s[i])
                out_end.append(tok_e[last_slot[i]])
                out_sid.append(sid_s[i])
                out_plural.append(np.ones(len(i), dtype=bool))

    if not out_doc:
        return empty
    doc = np.concatenate(out_doc)
    start_g = np.concatenate(out_start)
    end_g = np.concatenate(out_end)
    sid = np.concatenate(out_sid)
    plural = np.concatenate(out_plural)

    # string-verify hits (64-bit hash membership is not proof); hits are
    # few relative to tokens, so per-hit Python here is off the hot path
    keep = np.ones(len(doc), dtype=bool)
    for j in range(len(doc)):
        cand = big[start_g[j] : end_g[j]]
        # normalized candidate: token runs joined by single spaces
        norm = " ".join(_split_alnum(cand))
        want = vd.surfaces[sid[j]]
        if plural[j]:
            norm = norm[:-1]
        if norm != want:
            keep[j] = False
    if not keep.all():
        doc, start_g, end_g, sid, plural = (
            doc[keep], start_g[keep], end_g[keep], sid[keep], plural[keep]
        )

    base = doc_bounds[doc]
    return doc, start_g - base, end_g - base, sid, plural


def _split_alnum(s: str) -> list[str]:
    out = []
    cur = []
    for ch in s:
        if ("a" <= ch <= "z") or ("0" <= ch <= "9"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out
