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


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """crc32 hashes of the k-shingles (character shingles of the normalized
    text); returns unique uint64 values."""
    if len(text) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    enc = text.encode("utf-8")
    vals = {zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)}
    return np.fromiter(vals, dtype=np.uint64, count=len(vals))


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
