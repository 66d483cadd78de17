"""Pair-scoring string-similarity kernels (SURVEY.md §2.8 target additions).

The hot batch path uses an embedded DuckDB connection (C++-vectorized
``levenshtein`` / ``jaro_winkler_similarity`` over a zero-copy Arrow batch)
held as actor state — a public, in-process engine, no network. Pure-Python
reference implementations live alongside for unit tests and as fallback.

Jaro-Winkler follows the standard definition (prefix bonus up to 4 chars,
scaling 0.1, applied only when jaro > 0.7) — the same variant DuckDB
implements, property-tested against it in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (reference impl)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    j = jaro(a, b)
    if j > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca == cb:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return j


class DuckSimilarity:
    """Vectorized batch scorer over Arrow arrays via an embedded DuckDB.

    Build once per actor (``__init__``), call per batch. The connection is
    single-threaded-configured so actor pools don't oversubscribe CPUs.
    """

    def __init__(self, threads: int = 1):
        import duckdb

        self.con = duckdb.connect()
        self.con.execute(f"SET threads TO {threads}")

    def scores(self, left: pa.Array, right: pa.Array) -> dict[str, np.ndarray]:
        tbl = pa.table({"l": left, "r": right})
        out = self.con.execute(
            """
            SELECT levenshtein(l, r) AS lev,
                   jaro_winkler_similarity(l, r) AS jw,
                   jaccard(l, r) AS jac
            FROM tbl
            """
        ).fetch_arrow_table()
        return {
            "lev": out["lev"].to_numpy(),
            "jw": out["jw"].to_numpy(),
            "jac": out["jac"].to_numpy(),
        }


_BATCH_SCORER: "DuckSimilarity | None" = None


def batch_jw(a, b) -> np.ndarray:
    """Vectorized Jaro-Winkler over two same-length string sequences via a
    per-worker-process cached :class:`DuckSimilarity` (VERDICT r4 #4 —
    replaces per-pair Python ``jaro_winkler`` loops in blocked verification
    stages; values are property-test-pinned identical to the Python kernel,
    tests/test_properties.py, except the single pair ("", "") where Python
    returns 1.0 and DuckDB 0.0 — unreachable in the verification stages,
    whose pairs are of DISTINCT names, and the DuckDB value is the oracle's
    own semantics anyway). The cache is safe as module state: the
    connection holds no result-affecting state and Ray map workers reuse
    the process across tasks, so the connect cost is paid once per worker,
    not per group."""
    global _BATCH_SCORER
    if _BATCH_SCORER is None:
        _BATCH_SCORER = DuckSimilarity(threads=1)
    # jw-only query: DuckDB's jaccard() (computed by .scores) rejects
    # empty strings, and the verification stages only need jw anyway
    tbl = pa.table({"l": pa.array(a, pa.string()),
                    "r": pa.array(b, pa.string())})
    out = _BATCH_SCORER.con.execute(
        "SELECT jaro_winkler_similarity(l, r) AS jw FROM tbl"
    ).fetch_arrow_table()
    return out["jw"].to_numpy()


def hash_embed(texts: list[str], dim: int = 64) -> np.ndarray:
    """Deterministic char-3gram hash embedding (unit-normalized float64).

    Stand-in for the bi-encoder (SURVEY.md A3) that needs no model weights:
    every 3-gram hashes (crc32) to a signed slot; rows are L2-normalized.
    Deterministic across processes (no PYTHONHASHSEED dependence).
    """
    import zlib

    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        s = f"##{t}##"
        for j in range(len(s) - 2):
            h = zlib.crc32(s[j : j + 3].encode("utf-8"))
            out[i, h % dim] += 1.0 if (h >> 31) & 1 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


_SOUNDEX_CODE = {}
for _cs, _d in (
    ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
    ("L", "4"), ("MN", "5"), ("R", "6"),
):
    for _c in _cs:
        _SOUNDEX_CODE[_c] = _d


def soundex(s: str) -> str:
    """American Soundex (NARA variant): 4-char phonetic code over the
    letters of ``s`` (non-letters dropped, so multi-word names encode as
    one token). H/W do not separate equal codes; vowels do. Pinned to the
    classic vectors (Robert/Rupert→R163, Ashcraft→A261, Tymczak→T522,
    Pfister→P236) in tests/test_similarity.py."""
    letters = [c for c in s.upper() if "A" <= c <= "Z"]
    if not letters:
        return "0000"
    first = letters[0]
    out: list[str] = []
    prev = _SOUNDEX_CODE.get(first, "")
    for c in letters[1:]:
        d = _SOUNDEX_CODE.get(c, "")
        if d and d != prev:
            out.append(d)
        if c not in "HW":
            prev = d
    return (first + "".join(out) + "000")[:4]


def monge_elkan_micro(a_tokens: list[str], b_tokens: list[str]) -> int:
    """Directed Monge-Elkan similarity (Monge & Elkan, KDD'96) in exact
    integer micro-units: for each token of ``a_tokens``, the best
    Jaro-Winkler match among ``b_tokens``, each best rounded half-even to
    1e-6 BEFORE summing so the value is an order-independent integer (the
    same quantize-then-sum contract as the tfidf/cents kernels — DuckDB
    oracle: ``SUM(CAST(round(max(jaro_winkler_similarity(..))*1000000, 0)
    AS BIGINT))`` grouped per a-token position). The conventional ME score
    is this sum divided by ``len(a_tokens)``; the division is left to the
    caller so only integers cross engine boundaries."""
    total = 0
    for ta in a_tokens:
        best = 0.0
        for tb in b_tokens:
            s = jaro_winkler(ta, tb)
            if s > best:
                best = s
        # float(np.rint) not needed: round-half-even on x*1e6; random JW
        # doubles never land exactly on .5 (same argument as cents()).
        total += int(_rint6(best))
    return total


def _rint6(x: float) -> int:
    """round(x * 1e6) half-even as an int — one shared rounding so the
    kernel and its tests cannot drift."""
    import numpy as np

    return int(np.rint(x * 1e6))
