"""Mergeable cardinality sketches (HyperLogLog).

The approximate-distinct operator a 100 TB pipeline needs where exact
COUNT DISTINCT (``q_doc_freq`` / ``distinct_column``) would shuffle every
key: fixed 2^p-byte registers per partition, merged by elementwise max —
order-independent and associative, so partials combine in any tree shape
with zero re-scan (Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007).

Determinism policy (the repo's oracle discipline, see oracles.py): the
value hash is splitmix64 — a fixed integer mixer, bit-identical in any
implementation — and the estimator is computed with EXACT INTEGER
arithmetic (sum of 2^(64-r) as Python ints) so no float-summation order
can perturb the estimate; the single final division/log happens once on
the driver. Engine and oracle therefore agree bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(m) = 1.6%
HLL_M = 1 << HLL_P

_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (Steele et al. 2014 —
    the JDK SplittableRandom mixer; public constants)."""
    z = (np.asarray(x).astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _U64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _U64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _U64
    return z ^ (z >> np.uint64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Build a register array (uint8[2^p]) from 64-bit value hashes.

    idx = top p bits; rank = leading zeros of the remaining 64-p bits
    (as a left-aligned word) + 1, i.e. 64 - p + 1 when they are all zero.
    """
    h = np.asarray(hashes, dtype=np.uint64)
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & _U64
    rank = (65 - _bit_length_u64(w)).astype(np.int64)  # w=0 -> 65 -> cap
    np.minimum(rank, 64 - p + 1, out=rank)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Integer-exact HLL estimate: S = sum_j 2^(64 - r_j) as a Python int
    (order-independent), E = alpha_m * m^2 * 2^64 / S, with the standard
    small-range linear-counting correction. 64-bit hashes need no
    large-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_int = sum(1 << (64 - int(r)) for r in regs)  # exact integer
    est = alpha * m * m * float(2**64) / float(s_int)
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return int(round(est))
