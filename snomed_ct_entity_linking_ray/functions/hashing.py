"""Deterministic hashing kernels: stable row hashes, MinHash, SimHash,
rolling fingerprints (engine additions for the dedup/fingerprint operators).

All hashes are process-stable (no Python ``hash()``), vectorized with numpy
where the input is already tokenized. MinHash uses the standard universal
hashing family ``(a*x + b) mod p`` over 64-bit shingle hashes (public
construction, Broder 1997).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def md5_hex(s: str) -> str:
    """Content fingerprint matching DuckDB ``md5()``."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def stable_u64(s: str) -> int:
    """64-bit stable string hash (first 8 bytes of md5, big-endian)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _crc32_window_tables(k: int) -> tuple[np.ndarray, int]:
    """Per-position crc32 contribution tables for k-byte windows.

    crc32 is AFFINE over GF(2): crc(m) = c ⊕ L(m) with L linear, so for a
    fixed window length k, crc(m) = (⊕_j T[j][m_j]) ⊕ ((k+1) % 2) · c
    where T[j][v] = crc32 of the k-zero-byte message with byte j set to v
    and c = crc32(0^k). This turns all sliding-window crc32s of a buffer
    into k vectorized table lookups + XOR (verified bit-equal to
    zlib.crc32 in tests/test_properties.py)."""
    c = zlib.crc32(b"\x00" * k)
    T = np.zeros((k, 256), dtype=np.uint32)
    m = bytearray(k)
    for j in range(k):
        for v in range(256):
            m[j] = v
            T[j, v] = zlib.crc32(bytes(m))
        m[j] = 0
    return T, (c if (k + 1) % 2 else 0)


_SHINGLE_TABLES: dict[int, tuple[np.ndarray, int]] = {}


def crc32_windows(buf: np.ndarray, k: int) -> np.ndarray:
    """zlib.crc32 of every k-byte sliding window of ``buf`` (uint8 array),
    fully vectorized — no per-window Python."""
    if k not in _SHINGLE_TABLES:
        _SHINGLE_TABLES[k] = _crc32_window_tables(k)
    T, corr = _SHINGLE_TABLES[k]
    n = len(buf) - k + 1
    acc = T[0][buf[:n]].copy()
    for j in range(1, k):
        acc ^= T[j][buf[j : j + n]]
    if corr:
        acc ^= np.uint32(corr)
    return acc


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """crc32 hashes of the k-shingles (character shingles of the normalized
    text); returns unique uint64 values. Identical values to the original
    per-window ``zlib.crc32`` set build (MinHash consumes the min per
    permutation, so uniqueness order is irrelevant), but computed with the
    vectorized table-lookup kernel — the per-doc cost drops from
    O(len) Python crc calls to a handful of numpy ops."""
    if len(text) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    enc = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return np.unique(crc32_windows(enc, k)).astype(np.uint64)


class MinHasher:
    """num_perm-permutation MinHash with fixed seeded coefficients."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """[num_perm] uint64 signature; empty input -> all-max sentinel."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) mod p for each perm: [num_perm, n]
        x = shingles[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    _PERM_CHUNK = 16
    _SLICE_HASHES = 1 << 16  # 64k hashes → 8 MB scratch rows, 1-time touch

    def signatures_batch(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """[n_docs, num_perm] signatures for a whole batch at once:
        ``flat`` is the concatenation of every doc's shingle hashes,
        ``offsets`` ([n_docs+1], strictly increasing — shingle_hashes never
        yields an empty set) the doc boundaries. Bit-identical to calling
        ``signature`` per doc (uint64 min is exact); ``np.minimum.reduceat``
        over doc-aligned slices replaces n_docs Python-level matrix setups.

        All temporaries live in ONE fixed-size pre-touched scratch buffer
        per MinHasher (= per actor): fresh large allocations on this host
        class pay throttled first-touch page zeroing (measured 38 MB ≈ 7 s
        first touch, 8 ms warm), so the work is sliced into doc-aligned
        groups of ≤ _SLICE_HASHES hashes that fit the buffer."""
        n_docs = len(offsets) - 1
        if n_docs == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        offsets = np.asarray(offsets, dtype=np.int64)
        if not (np.diff(offsets) > 0).all():
            raise ValueError("signatures_batch requires non-empty segments")
        buf = getattr(self, "_buf", None)
        if buf is None:
            buf = np.empty((self._PERM_CHUNK, self._SLICE_HASHES), dtype=np.uint64)
            buf.fill(0)  # pre-touch once per actor
            self._buf = buf
        out = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        d0 = 0
        while d0 < n_docs:
            # largest doc group whose shingles fit the scratch slice
            d1 = int(
                np.searchsorted(offsets, offsets[d0] + self._SLICE_HASHES, "right") - 1
            )
            if d1 <= d0:  # one huge doc: fall back to the per-doc path
                out[d0] = self.signature(flat[offsets[d0] : offsets[d0 + 1]])
                d0 += 1
                continue
            lo, hi = offsets[d0], offsets[d1]
            n = int(hi - lo)
            x = flat[None, lo:hi]
            seg = offsets[d0:d1] - lo
            for j0 in range(0, self.num_perm, self._PERM_CHUNK):
                j1 = min(j0 + self._PERM_CHUNK, self.num_perm)
                v = buf[: j1 - j0, :n]
                np.multiply(self.a[j0:j1, None], x, out=v)
                np.add(v, self.b[j0:j1, None], out=v)
                np.mod(v, _MERSENNE, out=v)
                out[d0:d1, j0:j1] = np.minimum.reduceat(v, seg, axis=1).T
            d0 = d1
        return out

    def band_keys(self, sig: np.ndarray, bands: int) -> list[str]:
        """LSH band bucket keys: hash of each band's rows."""
        rows = self.num_perm // bands
        keys = []
        for b in range(bands):
            band = sig[b * rows : (b + 1) * rows]
            h = zlib.crc32(band.tobytes())
            keys.append(f"{b}:{h:08x}")
        return keys

    def band_key_ints(self, sig: np.ndarray, bands: int) -> list[int]:
        """Same buckets as ``band_keys`` under an INJECTIVE int64 encoding
        ``(band_index << 32) | crc32(band_bytes)`` — identical membership
        (tested), but the wide groupby sorts int64 instead of strings."""
        rows = self.num_perm // bands
        return [
            (b << 32) | zlib.crc32(sig[b * rows : (b + 1) * rows].tobytes())
            for b in range(bands)
        ]


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token crc-based hashes (Charikar 2002)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = stable_u64(t)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class SimHasher:
    """Batched SimHash, bit-equal to ``simhash64`` (property-tested):
    per-batch np.unique collapses the token stream to its vocabulary, a
    per-instance (= per-actor) cache bounds the md5 token hashing to
    NEW vocabulary (Zipf makes this the dominant saving at corpus scale),
    and the ±1 bit sums are one reduceat over the whole batch — no
    per-token or per-bit Python in the hot path."""

    _CACHE_MAX = 1 << 20  # ~8 MB of uint64 values; plenty for any vocab here

    def __init__(self):
        self._cache: dict[str, int] = {}
        self._bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]

    def _token_hashes(self, uniq: np.ndarray) -> np.ndarray:
        c = self._cache
        miss = [t for t in uniq if t not in c]
        if miss:
            if len(c) + len(miss) > self._CACHE_MAX:
                c.clear()
            for t in miss:
                c[t] = stable_u64(t)
        return np.fromiter((c[t] for t in uniq), dtype=np.uint64, count=len(uniq))

    def batch(self, tokens_flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """[n_docs] uint64 simhashes; ``tokens_flat`` is the concatenated
        token stream, ``offsets`` [n_docs+1] the doc boundaries (strictly
        increasing — a split of any string yields ≥1 token)."""
        n_docs = len(offsets) - 1
        if n_docs == 0:
            return np.empty(0, dtype=np.uint64)
        offsets = np.asarray(offsets, dtype=np.int64)
        if not (np.diff(offsets) > 0).all():
            raise ValueError("SimHasher.batch requires non-empty segments")
        uniq, inv = np.unique(tokens_flat, return_inverse=True)
        h = self._token_hashes(uniq)[inv]  # [n_tok]
        bits = ((h[:, None] & self._bitcols) != 0).astype(np.int32)  # [n_tok, 64]
        pm = 2 * bits - 1
        sums = np.add.reduceat(pm, offsets[:-1], axis=0)  # [n_docs, 64]
        return ((sums > 0).astype(np.uint64) * self._bitcols[0][None, :]).sum(
            axis=1, dtype=np.uint64
        )


WINNOW_BASE = np.uint64(1099511628211)  # FNV-64 prime as polynomial base


def winnow_fingerprints(
    text: str, window: int = 12, mod_bits: int = 4
) -> np.ndarray:
    """Vectorized winnowing document fingerprints (the MOSS scheme,
    Schleimer et al. 2003, public): base-WINNOW_BASE polynomial rolling
    hash of every ``window``-byte window (wrapping mod 2^64), keep the
    hashes ≡ 0 (mod 2^mod_bits), deduped ascending; deterministic
    fallback to ``[min window hash]`` when the filter selects nothing.
    All-numpy (sliding_window_view × power vector, uint64 wraparound) —
    property-tested bit-equal to the plain per-window Horner loop
    (tests/test_properties.py), which is also the independent oracle's
    implementation."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    w = min(window, n)
    exps = np.arange(w - 1, -1, -1, dtype=np.uint64)
    powers = np.power(np.full(w, WINNOW_BASE, dtype=np.uint64), exps)
    wins = np.lib.stride_tricks.sliding_window_view(b, w)
    h = (wins * powers).sum(axis=1, dtype=np.uint64)
    sel = h[(h & np.uint64((1 << mod_bits) - 1)) == np.uint64(0)]
    if len(sel) == 0:
        sel = np.array([h.min()], dtype=np.uint64)
    return np.unique(sel)


def rolling_fingerprints(text: str, window: int = 16, mod_bits: int = 6) -> list[int]:
    """Winnowing-style document fingerprints (Schleimer et al., 2003, public):
    crc32 of each window, keep hashes ≡ 0 (mod 2^mod_bits)."""
    enc = text.encode("utf-8")
    if len(enc) <= window:
        return [zlib.crc32(enc)]
    mask = (1 << mod_bits) - 1
    out = []
    for i in range(len(enc) - window + 1):
        h = zlib.crc32(enc[i : i + window])
        if (h & mask) == 0:
            out.append(h)
    return out or [zlib.crc32(enc)]


def bloom_encode64(name: str, n_hashes: int = 2) -> int:
    """64-bit Bloom-filter encoding of a name's character bigrams — the
    PPRL cryptographic-linkage encoding (Schnell/Bachteler/Reiher 2009,
    shrunk to one machine word for the operator demo): each padded bigram
    sets ``n_hashes`` bits chosen by independent crc32 draws. Shared
    between the engine and its oracle because bit-exactness of the
    encoding IS the contract (the simhash64 rationale)."""
    s = f"_{name.lower()}_"
    bits = 0
    for i in range(len(s) - 1):
        bg = s[i : i + 2].encode("utf-8", "ignore")
        for h in range(n_hashes):
            v = zlib.crc32(bg + bytes([h]))
            bits |= 1 << (v & 63)
    return bits
