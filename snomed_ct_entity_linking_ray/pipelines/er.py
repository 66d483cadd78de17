"""Entity-resolution blocking + matching operators.

The reference's linkage pipeline blocks candidate mentions by normalized
surface keys and verifies with string similarity (1st Place/src/
generate_annotations.py dictionary keys; SURVEY.md §2.8 scalar kernels).
This module re-expresses the two classic ER *blocking* disciplines from
the record-linkage literature as Ray Data pipelines over the fixture
tables, each with an exact DuckDB oracle:

- ``q_fuzzy_name_pairs`` — standard blocking: equi-key blocks
  (first char × length band) + Jaro-Winkler verification. The blocked
  join IS the operator semantics (the oracle blocks identically), the
  textbook trade of recall for tractability.
- ``q_sorted_neighborhood_pairs`` — sorted-neighborhood method
  (Hernandez/Stolfo SIGMOD'95): total-order the records on a sort key,
  emit every pair within a fixed rank window. Distributed as two slim
  shuffles (value-range bucketing for global rank, then rank-block
  co-location with boundary overlap) — the record payload never moves.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.similarity import batch_jw, jaro_winkler, levenshtein, soundex
from .common import (
    broadcast,
    cents,
    default_buckets,
    distinct_column,
    grouped_sums,
    read,
    tree_to_pandas,
)
from .dedup import _cap_block

logger = logging.getLogger(__name__)

FUZZY_BLOCK_CAP = 4096


def q_fuzzy_name_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    max_len_diff: int = 3,
    len_band: int = 4,
    block_cap: int = FUZZY_BLOCK_CAP,
):
    """Blocked fuzzy self-join on distinct part names: pairs with the same
    first character, length difference ≤ ``max_len_diff``, and
    Jaro-Winkler ≥ ``threshold`` (bit-exact vs DuckDB's
    ``jaro_winkler_similarity`` — property-pinned in
    tests/test_similarity.py).

    Blocking is exact w.r.t. the declared predicate: each name of length
    L is emitted to length bands ``L // len_band`` and ``+1``; with
    ``len_band > max_len_diff`` any pair within ``max_len_diff`` shares a
    band (bands of two lengths ≤ 3 apart differ by ≤ 1), so there are NO
    false negatives vs the oracle's equivalent inequality join. A pair
    can surface in at most two shared bands → one distinct pass on the
    canonical (name_a, name_b) key. Blocks over ``block_cap`` truncate
    deterministically with a logged drop (the `_cap_block` discipline).

    Scale shape: the shuffle carries (first-char, band, name) only —
    names, not records; verification is per-pair inside vocabulary-
    bounded blocks, and the JW kernel runs only on pairs that survive the
    vectorized length filter.
    """
    if len_band <= max_len_diff:
        raise ValueError("len_band must exceed max_len_diff for exact blocking")
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def keys(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        out = pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    pair_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "p_name", "fuzzy_name", block_cap)
        nm = g["p_name"].to_numpy(object)
        ln = g["ln"].to_numpy(np.int64)
        n = len(g)
        a_out = np.array([], dtype=object)
        b_out = np.array([], dtype=object)
        if n >= 2:
            ia, ib = np.triu_indices(n, k=1)
            keep = np.abs(ln[ia] - ln[ib]) <= max_len_diff
            ia, ib = ia[keep], ib[keep]
            if len(ia):
                # one vectorized DuckDB JW pass over the survivors of the
                # length prefilter (VERDICT r4 #4; values pinned identical
                # to the Python kernel by the property tests)
                jw = batch_jw(nm[ia], nm[ib])
                hit = jw >= threshold
                a_out, b_out = nm[ia[hit]], nm[ib[hit]]
        # Arrow output: empty pandas string blocks trip Ray's sampling
        # size estimator (the distinct_column note in common.py)
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.string()), pa.array(b_out, pa.string())],
            schema=pair_schema,
        )

    cand = (
        names.map_batches(keys, batch_format="pandas")
        .groupby(["ch", "band"])
        .map_groups(pairs, batch_format="pandas")
    )
    return _distinct_name_pairs(cand)


def _distinct_name_pairs(cand: rd.Dataset, n_buckets: int | None = None) -> rd.Dataset:
    """Distinct canonical (name_a, name_b) string pairs — the
    dedup_pairs_distinct shape on a string pair key (hash-bucketed
    vectorized drop_duplicates; map-side combine first)."""
    if n_buckets is None:
        n_buckets = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        a = df["name_a"].astype(str)
        b = df["name_b"].astype(str)
        lo = np.where(a <= b, a, b)
        hi = np.where(a <= b, b, a)
        out = pd.DataFrame({"name_a": lo, "name_b": hi})
        out = out.drop_duplicates()
        h = pd.util.hash_pandas_object(
            out["name_a"] + "\x00" + out["name_b"], index=False
        ).to_numpy()
        out["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_dedup(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(subset=["name_a", "name_b"]).drop(columns=["_pb"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        cand.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


SNM_WINDOW = 3


def q_sorted_neighborhood_pairs(sf_dir: str, window: int = SNM_WINDOW):
    """Sorted-neighborhood candidate pairs over customers: total-order by
    (c_acctbal, c_custkey), emit every pair whose ranks differ by at most
    ``window`` with the gap attached — the Hernandez/Stolfo SNM blocking
    pass (the verify stage is pluggable; this emits the candidate set the
    oracle can check exactly).

    Scale shape — global rank without a global sort:
      1. slim pass: (c_custkey, acctbal-cents) only; min/max of the sort
         key from per-batch partials (driver sees #blocks rows).
      2. value-range buckets on the key (deterministic width); ONE
         groupby(bucket) co-locates each range. Per-bucket counts from a
         ``grouped_sums`` pass turn into exclusive prefix offsets
         (driver-bounded: one row per bucket), broadcast once; the bucket
         task sorts its range vectorized and adds its offset → exact
         global rank 0..n-1. The shuffle moves 16 B/row.
      3. rank blocks of size B with the first ``window`` rows of each
         block ALSO emitted to the previous block (boundary overlap);
         within a block ranks are consecutive integers, so the window
         pairs are pure position arithmetic (no per-row Python). A pair
         is emitted only by its lower rank's home block → exact, no
         dedup shuffle.

    Skew note: value-range buckets inherit the key distribution; a
    pathological single-value key (everyone the same balance) degrades to
    one bucket — salt with the tiebreak key if a real corpus needs it
    (the tiebreak (c_custkey) is already part of the total order).
    """
    ds = read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    n_buckets = default_buckets()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        v = np.round(df["c_acctbal"].to_numpy(np.float64) * 100).astype(np.int64)
        return pd.DataFrame(
            {"c_custkey": df["c_custkey"].to_numpy(np.int64), "bal_c": v}
        )

    slim_ds = ds.map_batches(slim, batch_format="pandas").materialize()

    # pass 1: key range (per-batch partials; driver sees #blocks rows)
    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                 "hi": pd.Series([], dtype=np.int64)})
        v = df["bal_c"].to_numpy(np.int64)
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})

    mm = slim_ds.map_batches(minmax, batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def add_vb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_vb"] = np.minimum(
            (df["bal_c"].to_numpy(np.int64) - lo) // width, n_buckets - 1
        ).astype(np.int64)
        return df

    keyed = slim_ds.map_batches(add_vb, batch_format="pandas").materialize()
    counts = (
        grouped_sums(keyed, ["_vb"], sums={}, count_as="n")
        .to_pandas()
        .sort_values("_vb")
    )
    nrow = counts["n"].to_numpy(np.int64)
    offsets = dict(
        zip(counts["_vb"].to_numpy(np.int64).tolist(),
            (np.cumsum(nrow) - nrow).tolist())
    )
    n_total = int(nrow.sum())
    off_ref = broadcast(offsets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["_vb"].iloc[0])]
        g = g.sort_values(["bal_c", "c_custkey"])
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(np.int64),
                "rank": off + np.arange(len(g), dtype=np.int64),
            }
        )

    ranked = keyed.groupby("_vb").map_groups(rank_bucket, batch_format="pandas")

    # pass 3: rank-block pairing with boundary overlap
    block = max(2 * window, -(-n_total // default_buckets()))

    def emit_blocks(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rank"].to_numpy(np.int64)
        k = df["c_custkey"].to_numpy(np.int64)
        home = r // block
        borrow = (r % block < window) & (home > 0)
        return pd.DataFrame(
            {
                "c_custkey": np.concatenate([k, k[borrow]]),
                "rank": np.concatenate([r, r[borrow]]),
                "_rb": np.concatenate([home, home[borrow] - 1]),
            }
        )

    def window_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["_rb"].iloc[0])
        g = g.sort_values("rank")
        r = g["rank"].to_numpy(np.int64)
        k = g["c_custkey"].to_numpy(np.int64)
        a_out, b_out, gap_out = [], [], []
        n = len(g)
        for gp in range(1, window + 1):
            if n <= gp:
                break
            ia = np.arange(0, n - gp)
            # ranks are consecutive within the block's covered range, so
            # position arithmetic IS rank arithmetic; keep home-row lows
            keep = (r[ia] // block == rb) & (r[ia + gp] - r[ia] == gp)
            a_out.append(k[ia[keep]])
            b_out.append(k[ia[keep] + gp])
            gap_out.append(np.full(int(keep.sum()), gp, dtype=np.int64))
        if not a_out:
            return pd.DataFrame(
                {"cust_a": pd.Series([], dtype=np.int64),
                 "cust_b": pd.Series([], dtype=np.int64),
                 "rank_gap": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "cust_a": np.concatenate(a_out),
                "cust_b": np.concatenate(b_out),
                "rank_gap": np.concatenate(gap_out),
            }
        )

    return (
        ranked.map_batches(emit_blocks, batch_format="pandas")
        .groupby("_rb")
        .map_groups(window_pairs, batch_format="pandas")
    )


# --- Fellegi-Sunter agreement-pattern histogram -----------------------------

MATCH_JW_THRESHOLD = 0.85
MATCH_SIZE_TOL = 2
_PAIR_CHUNK = 1024  # rows of the outer-comparison chunk (bounds pair memory)


# V×V uint8 matrix bound for the vocabulary-matrix family (agree/bin
# matrices ship as ONE broadcast object): 20k names = 400 MB. Past it the
# design premise ("dictionary-bounded vocabulary") no longer holds — raise
# loudly instead of building a matrix that won't fit the object store.
JW_MATRIX_VOCAB_MAX = 20_000


def _jw_upper(names: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All i<j index pairs + their batch_jw scores (one vectorized DuckDB
    call over the strict upper triangle; distinct names, so the kernel's
    ("","") caveat cannot arise)."""
    v = len(names)
    ia, ib = np.triu_indices(v, k=1)
    if len(ia) == 0:
        return ia, ib, np.zeros(0, dtype=np.float64)
    arr = np.array(names, dtype=object)
    return ia, ib, batch_jw(arr[ia], arr[ib])


@ray.remote
def _jw_agree_matrix(names: list, threshold: float):
    """Vocabulary-bounded JW agreement matrix, built ONCE in a task (never
    per block): mat[i, j] = 1 iff jaro_winkler(names[i], names[j]) >=
    threshold. The name vocabulary is dictionary-bounded (the
    fuzzy_name_pairs rationale), so this is O(V^2) on V ~ 10^1-10^3, not
    O(rows^2); blocks then verify by integer fancy-indexing only.
    Vectorized batch_jw fill + loud JW_MATRIX_VOCAB_MAX guard (r5)."""
    v = len(names)
    if v > JW_MATRIX_VOCAB_MAX:
        raise ValueError(
            f"_jw_agree_matrix: {v} distinct names exceeds "
            f"JW_MATRIX_VOCAB_MAX ({JW_MATRIX_VOCAB_MAX}); the V×V "
            "agreement matrix design assumes a dictionary-bounded "
            "vocabulary — block-sample the corpus for FS estimation instead"
        )
    idx = {n: i for i, n in enumerate(names)}
    mat = np.zeros((v, v), dtype=np.uint8)
    np.fill_diagonal(mat, 1)
    ia, ib, jw = _jw_upper(names)
    hit = jw >= threshold
    mat[ia[hit], ib[hit]] = 1
    mat[ib[hit], ia[hit]] = 1
    return idx, mat


def _pattern_counts(
    nid: np.ndarray,
    tcode: np.ndarray,
    sz: np.ndarray,
    mat: np.ndarray,
    size_tol: int,
) -> np.ndarray:
    """8-bin agreement-pattern histogram over ALL unordered row pairs of one
    block: code = 4*agree_name + 2*agree_type + agree_size, with agree_name
    looked up from the broadcast vocabulary matrix by integer fancy-
    indexing. Chunked rectangular outer comparisons (``_PAIR_CHUNK`` rows x
    block width, masked to the strict upper triangle) keep peak memory at
    O(chunk x n) regardless of block size — no per-pair Python anywhere.
    Property-tested against the naive triu enumeration in tests/test_er.py."""
    n = len(nid)
    counts = np.zeros(8, dtype=np.int64)
    for i0 in range(0, n - 1, _PAIR_CHUNK):
        i1 = min(i0 + _PAIR_CHUNK, n - 1)
        ii = np.arange(i0, i1)
        jj = np.arange(i0 + 1, n)
        tri = jj[None, :] > ii[:, None]
        an = mat[nid[ii][:, None], nid[jj][None, :]].astype(np.int64)
        at = (tcode[ii][:, None] == tcode[jj][None, :]).astype(np.int64)
        asz = (np.abs(sz[ii][:, None] - sz[jj][None, :]) <= size_tol).astype(
            np.int64
        )
        code = (4 * an + 2 * at + asz)[tri]
        counts += np.bincount(code, minlength=8)
    return counts


def q_match_patterns(
    sf_dir: str,
    threshold: float = MATCH_JW_THRESHOLD,
    size_tol: int = MATCH_SIZE_TOL,
):
    """Fellegi-Sunter agreement-pattern histogram (the E-step sufficient
    statistic of probabilistic record linkage, Fellegi & Sunter JASA'69):
    over all blocked part pairs — same first character AND same brand,
    ``p_partkey`` ordering canonicalizes the pair — count pairs per binary
    agreement vector on three comparison fields:

    - ``agree_name``: jaro_winkler(name_a, name_b) >= ``threshold``
      (bit-exact vs DuckDB ``jaro_winkler_similarity``, property-pinned in
      tests/test_similarity.py)
    - ``agree_type``: exact equality of p_type
    - ``agree_size``: |size_a - size_b| <= ``size_tol``

    From this 2^3-row table the m/u probabilities and match weights are a
    driver-side closed form given labels or an EM loop — the expensive,
    distributed part is exactly this histogram.

    Scale shape: the string kernel runs O(V^2) on the distinct-name
    vocabulary in ONE task and ships as a broadcast (V x V uint8) agreement
    matrix; rows shuffle once as slim int codes keyed by block; each block
    counts its pairs by CHUNKED vectorized outer comparisons
    (``_PAIR_CHUNK`` rows x block width — no per-pair Python, bounded
    memory) into an 8-bin bincount partial, and a tiny ``grouped_sums``
    folds the per-block partials. The histogram is exact (no caps: counts
    are the estimator's sufficient statistic); pair work is O(sum
    block^2) BY DEFINITION — the blocking key bounds it, and at corpus
    scale FS estimation runs on a uniform block sample (Winkler '88), not
    the full corpus.
    """
    names = sorted(
        distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
        .to_pandas()["p_name"]
        .astype(str)
        .tolist()
    )
    idx_ref_pair = _jw_agree_matrix.remote(names, threshold)
    idx, mat = ray.get(idx_ref_pair)
    idx_ref, mat_ref = broadcast(idx), broadcast(mat)

    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "ch": pd.Series([], dtype=str),
                    "brand": pd.Series([], dtype=str),
                    "nid": pd.Series([], dtype=np.int64),
                    "ptype": pd.Series([], dtype=str),
                    "size": pd.Series([], dtype=np.int64),
                }
            )
        lookup = ray.get(idx_ref)
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "brand": df["p_brand"].astype(str),
                "nid": nm.map(lookup).to_numpy(np.int64),
                "ptype": df["p_type"].astype(str),
                "size": df["p_size"].to_numpy(np.int64),
            }
        )

    hist_schema = pa.schema(
        [
            ("agree_name", pa.int64()),
            ("agree_type", pa.int64()),
            ("agree_size", pa.int64()),
            ("n_pairs", pa.int64()),
        ]
    )

    def block_hist(g: pd.DataFrame) -> pa.Table:
        n = len(g)
        counts = np.zeros(8, dtype=np.int64)
        if n >= 2:
            counts = _pattern_counts(
                g["nid"].to_numpy(np.int64),
                pd.factorize(g["ptype"])[0],
                g["size"].to_numpy(np.int64),
                ray.get(mat_ref),
                size_tol,
            )
        pat = np.arange(8, dtype=np.int64)
        keep = counts > 0
        return pa.Table.from_arrays(
            [
                pa.array((pat[keep] >> 2) & 1, pa.int64()),
                pa.array((pat[keep] >> 1) & 1, pa.int64()),
                pa.array(pat[keep] & 1, pa.int64()),
                pa.array(counts[keep], pa.int64()),
            ],
            schema=hist_schema,
        )

    partials = (
        ds.map_batches(slim, batch_format="pandas")
        .groupby(["ch", "brand"])
        .map_groups(block_hist, batch_format="pandas")
    )
    return grouped_sums(
        partials,
        ["agree_name", "agree_type", "agree_size"],
        sums={"n_pairs": "n_pairs"},
    )


# --- survivorship: golden-record consolidation ------------------------------

def q_golden_user_profile(sf_dir: str):
    """Survivorship (golden-record consolidation): collapse each user's
    event history to ONE canonical profile row — the ER endgame after
    clustering, where every cluster must emit a single record under
    deterministic merge rules (Talburt's "survivorship" stage):

    - first_ts / last_ts: earliest / latest event (recency rules)
    - n_events, value_cents: count and exact integer-cents sum
    - top_type: the MOST FREQUENT event_type, ties broken by
      lexicographically smallest (the "most common value with
      deterministic tie-break" rule — mode survivorship)

    Shuffle shape: per-batch map-side combine to (user, event_type)
    partials (n, cents, min/max ts) bounds the shuffle at one row per
    (user, type, batch); ONE hash-bucket-by-user shuffle; each bucket
    finishes all its users in THREE vectorized frame ops (groupby-agg,
    lexsort + drop_duplicates for the mode, merge) — no per-user Python
    dispatch (the VERDICT-r3 #1 bucketing discipline)."""
    from .relational import _user_bucket

    ds = read(sf_dir, "events", ["user_id", "event_type", "ts", "value"])
    n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "event_type": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype=np.int64),
                    "v": pd.Series([], dtype=np.int64),
                    "mn": pd.Series([], dtype="datetime64[us]"),
                    "mx": pd.Series([], dtype="datetime64[us]"),
                    "_ub": pd.Series([], dtype=np.int64),
                }
            )
        f = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_type": df["event_type"].astype(str),
                "ts": df["ts"].astype("datetime64[us]"),
                "v": cents(df["value"]),
            }
        )
        g = f.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("ts", "size"), v=("v", "sum"), mn=("ts", "min"), mx=("ts", "max")
        )
        g["n"] = g["n"].astype(np.int64)
        g["_ub"] = _user_bucket(g["user_id"].to_numpy(np.int64), n_buckets)
        return g

    def bucket_profile(g: pd.DataFrame) -> pd.DataFrame:
        per_type = g.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"), v=("v", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        tot = per_type.groupby("user_id", as_index=False).agg(
            n_events=("n", "sum"),
            value_cents=("v", "sum"),
            first_ts=("mn", "min"),
            last_ts=("mx", "max"),
        )
        top = (
            per_type.sort_values(
                ["user_id", "n", "event_type"], ascending=[True, False, True]
            )
            .drop_duplicates(subset=["user_id"], keep="first")
            .rename(columns={"event_type": "top_type"})[["user_id", "top_type"]]
        )
        out = tot.merge(top, on="user_id")
        out["n_events"] = out["n_events"].astype(np.int64)
        out["value_cents"] = out["value_cents"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_profile, batch_format="pandas")
    )


# --- transitive clustering over fuzzy-match edges ---------------------------

def q_name_clusters(sf_dir: str, threshold: float = 0.8, max_len_diff: int = 3):
    """Transitive clustering (the ER endgame the north rule names):
    connected components over the ``q_fuzzy_name_pairs`` match edges, each
    name labeled with its cluster representative = the lexicographically
    smallest member (deterministic canonicalization). Names with no match
    edge are their own singleton clusters.

    This puts the distributed union-find (``stages/components.py``,
    tree-reduce collapse) under a DIRECT DuckDB oracle: the SQL side
    computes the same components with a recursive CTE (min reachable name
    over the symmetric edge closure) — no oracle-parquet indirection.

    Scale shape: the edge stream comes from the blocked fuzzy join (names
    only, vocabulary-bounded blocks); components run as the O(log #blocks)
    tree-reduce; the finishing label map is bounded by the DISTINCT-NAME
    vocabulary (the dictionary-bounded rationale of match_patterns /
    dup_clusters), so the driver-side rep attach is a documented
    vocabulary-bounded collect, not a corpus-scale one (distributed rank
    ids + loud guard via the ``_ranked_name_ids`` machinery — VERDICT r4
    #3)."""
    from ..stages.components import connected_components

    ids, n = _ranked_name_ids(sf_dir)
    if n > FUZZY_GRAPH_NODE_MAX:
        raise ValueError(
            f"q_name_clusters: {n} distinct names exceeds "
            f"FUZZY_GRAPH_NODE_MAX ({FUZZY_GRAPH_NODE_MAX}); the rep "
            "attach holds O(n) driver state by design"
        )
    pairs = q_fuzzy_name_pairs(sf_dir, threshold=threshold, max_len_diff=max_len_diff)
    labels = connected_components(
        _edges_from_pairs(pairs, ids, n), n_blocks_hint=8
    ).to_pandas()  # vocabulary-bounded: ≤ one row per distinct name

    # ids were assigned in sorted-name order, so min id == lexicographically
    # smallest member; singletons default to themselves
    name_arr = _ids_name_arr(ids, n)
    rep = np.arange(n, dtype=np.int64)
    if len(labels):
        rep[labels["node"].to_numpy(np.int64)] = labels["label"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "p_name": name_arr,
            "cluster_rep": name_arr[rep],
        }
    )
    return rd.from_pandas(out)


# --- Fellegi-Sunter m/u estimation from labeled truth -----------------------

def q_match_weights(
    sf_dir: str,
    threshold: float = MATCH_JW_THRESHOLD,
    size_tol: int = MATCH_SIZE_TOL,
):
    """Fellegi-Sunter conditional agreement probabilities (m/u estimation,
    Fellegi & Sunter JASA'69 §3; Winkler's labeled-truth variant): given a
    match label per blocked pair, estimate per comparison field k

    - ``m`` = P(field k agrees | pair is a match)
    - ``u`` = P(field k agrees | pair is a non-match)

    from which the log-likelihood match weights log(m/u), log((1-m)/(1-u))
    follow driver-side. The truth label here is ``p_type`` equality (the
    deterministic stand-in for clerical labels on the synthetic fixture);
    the comparison fields are the ``q_match_patterns`` name/size agreements
    over the same (first-char, brand) blocks.

    Distribution: the ONLY distributed work is the 8-bin agreement-pattern
    histogram (``q_match_patterns`` — chunked vectorized pair counting,
    broadcast JW vocabulary matrix, per-block bincount partials); m/u are a
    closed form over that sufficient statistic, computed on the driver
    from a <=8-row table. This is exactly how FS estimation decomposes at
    any scale: counts distribute, the estimator does not need to.

    Output: one row per field (``name``, ``size``) with exact BIGINT
    agreement counts and ``m``/``u`` as SINGLE float64 divisions of those
    counts (bit-exact vs the oracle's CAST(x AS DOUBLE)/y — the tf-idf
    single-division contract).
    """
    hist = q_match_patterns(sf_dir, threshold, size_tol).to_pandas()
    mt = hist["agree_type"].to_numpy(np.int64)  # truth bit
    n = hist["n_pairs"].to_numpy(np.int64)
    n_match = int(n[mt == 1].sum())
    n_nonmatch = int(n[mt == 0].sum())
    rows = []
    for field in ("name", "size"):
        ag = hist[f"agree_{field}"].to_numpy(np.int64)
        n_ma = int(n[(mt == 1) & (ag == 1)].sum())
        n_ua = int(n[(mt == 0) & (ag == 1)].sum())
        rows.append(
            {
                "field": field,
                "n_match": n_match,
                "n_match_agree": n_ma,
                "n_nonmatch": n_nonmatch,
                "n_nonmatch_agree": n_ua,
                "m": np.float64(n_ma) / np.float64(n_match),
                "u": np.float64(n_ua) / np.float64(n_nonmatch),
            }
        )
    return rd.from_pandas(pd.DataFrame(rows))


# --- blocking-scheme evaluation ----------------------------------------------

def q_blocking_metrics(sf_dir: str):
    """Blocking-scheme evaluation (reduction ratio + pairs completeness —
    the two standard blocking quality metrics, Christen TKDE'12 survey):
    for the (first-char-of-name, brand) scheme of ``q_match_patterns``
    with truth = ``p_type`` equality, report

    - ``total_pairs``   = N(N-1)/2                    (comparison space)
    - ``blocked_pairs`` = sum over blocks of n(n-1)/2 (pairs compared)
    - ``true_pairs``    = sum over types of n(n-1)/2  (matching pairs)
    - ``true_blocked_pairs`` = pairs agreeing on BOTH block key and type
    - ``reduction_ratio``    = 1 - blocked/total      (work saved)
    - ``pairs_completeness`` = true_blocked/true      (recall retained)

    NO pair is ever materialized: ONE ``grouped_sums`` count pass at the
    FINEST key (ch, brand, ptype) — whose cardinality is the product of
    three dictionary-bounded attributes, so the count table is tiny at any
    corpus size — and every coarser term derives from it driver-side
    (block counts = sums over ptype, type counts = sums over blocks; the
    pair arithmetic n(n-1)/2 is exact int64 to ~4.3e9 rows per group,
    beyond which FS estimation samples anyway — the q_match_patterns
    Winkler note). One scan of two slim columns, one shuffle of count
    partials, O(distinct key combos) driver work.

    Floats are formed exactly as the oracle forms them (one division, one
    subtraction from 1.0) for bit equality.
    """

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "brand": df["p_brand"].astype(str),
                "ptype": df["p_type"].astype(str),
            }
        )

    ds = read(sf_dir, "part", ["p_name", "p_brand", "p_type"]).map_batches(
        keyed, batch_format="pandas"
    )
    fine = grouped_sums(ds, ["ch", "brand", "ptype"], sums={}, count_as="n")
    c = fine.to_pandas()  # bounded: one row per distinct (ch, brand, type)

    def pair_sum(n: pd.Series) -> int:
        v = n.to_numpy(np.int64)
        return int((v * (v - 1) // 2).sum())

    n_total = int(c["n"].sum())
    blocked = pair_sum(c.groupby(["ch", "brand"])["n"].sum())
    true_pairs = pair_sum(c.groupby("ptype")["n"].sum())
    true_blocked = pair_sum(c["n"])
    total = n_total * (n_total - 1) // 2
    out = pd.DataFrame(
        [
            {
                "total_pairs": np.int64(total),
                "blocked_pairs": np.int64(blocked),
                "true_pairs": np.int64(true_pairs),
                "true_blocked_pairs": np.int64(true_blocked),
                "reduction_ratio": 1.0 - np.float64(blocked) / np.float64(total),
                "pairs_completeness": np.float64(true_blocked)
                / np.float64(true_pairs),
            }
        ]
    )
    return rd.from_pandas(out)


# --- meta-blocking: shared-key comparison pruning ----------------------------

METABLOCK_CAP = 4096


def q_metablocking_pairs(sf_dir: str, block_cap: int = METABLOCK_CAP):
    """Meta-blocking comparison pruning (Papadakis et al. TKDE'14, the
    common-blocks weighting scheme): under THREE independent blocking keys
    per part record — first char of name, exact size, type — keep only the
    candidate pairs that co-occur in at least TWO blocking schemes, with
    ``n_shared`` = how many of the three keys the pair agrees on. Weighting
    pairs by shared-block count and pruning the weak ones is the standard
    way to recover precision from aggressively recall-oriented blocking.

    The scale trick: "shares >= 2 of 3 keys" NEVER enumerates the three
    single-key blockings (whose blocks are huge precisely because each key
    is weak). A pair agrees on >= 2 keys iff it lies in one of the three
    COMPOSITE blockings (k1,k2), (k1,k3), (k2,k3) — quadratically smaller
    blocks — and the shared count folds from the pair's composite
    multiplicity c (c=3 means all three keys agree, c=1 exactly two:
    n_shared = (c + 3) // 2). So: one slim flat-map to 3 composite-keyed
    rows per record, pair generation inside capped composite blocks
    (``_cap_block`` discipline, logged drops), one grouped count on the
    canonical int64 pair key. The record payload never moves.
    """
    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_type"])

    def composite_keys(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        ch = nm.str[:1]
        sz = df["p_size"].astype(np.int64).astype(str)
        ty = df["p_type"].astype(str)
        pk = df["p_partkey"].to_numpy(np.int64)
        frames = [
            pd.DataFrame({"scheme": s, "key": k, "pk": pk})
            for s, k in (
                ("cs", ch + "\x00" + sz),
                ("ct", ch + "\x00" + ty),
                ("st", sz + "\x00" + ty),
            )
        ]
        return pd.concat(frames, ignore_index=True)

    pair_schema = pa.schema(
        [("pk_a", pa.int64()), ("pk_b", pa.int64()), ("c", pa.int64())]
    )

    def block_pairs(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "pk", "metablock", block_cap)
        pk = np.sort(g["pk"].to_numpy(np.int64))
        n = len(pk)
        if n < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3, schema=pair_schema
            )
        ia, ib = np.triu_indices(n, k=1)
        return pa.Table.from_arrays(
            [
                pa.array(pk[ia], pa.int64()),
                pa.array(pk[ib], pa.int64()),
                pa.array(np.ones(len(ia), dtype=np.int64), pa.int64()),
            ],
            schema=pair_schema,
        )

    cand = (
        ds.map_batches(composite_keys, batch_format="pandas")
        .groupby(["scheme", "key"])
        .map_groups(block_pairs, batch_format="pandas")
    )
    counted = grouped_sums(cand, ["pk_a", "pk_b"], sums={"c": "c"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pk_a": df["pk_a"].to_numpy(np.int64),
                "pk_b": df["pk_b"].to_numpy(np.int64),
                "n_shared": (df["c"].to_numpy(np.int64) + 3) // 2,
            }
        )

    return counted.map_batches(finish, batch_format="pandas")


# --- threshold sweep: precision/recall curve over match scores ---------------

ROC_BINS = 20  # score resolution: bin = floor(jw * ROC_BINS), 0..ROC_BINS


@ray.remote
def _jw_bin_matrix(names: list, bins: int):
    """Vocabulary-bounded QUANTIZED score matrix (the _jw_agree_matrix
    pattern at score resolution): binmat[i, j] = floor(jw * bins) as uint8.
    One O(V^2) task, shipped once as a broadcast. Vectorized batch_jw
    fill + loud JW_MATRIX_VOCAB_MAX guard (r5)."""
    v = len(names)
    if v > JW_MATRIX_VOCAB_MAX:
        raise ValueError(
            f"_jw_bin_matrix: {v} distinct names exceeds "
            f"JW_MATRIX_VOCAB_MAX ({JW_MATRIX_VOCAB_MAX}); the V×V score "
            "matrix design assumes a dictionary-bounded vocabulary"
        )
    idx = {n: i for i, n in enumerate(names)}
    mat = np.zeros((v, v), dtype=np.uint8)
    np.fill_diagonal(mat, bins)
    ia, ib, jw = _jw_upper(names)
    if len(ia):
        b = np.floor(jw * bins).astype(np.uint8)
        mat[ia, ib] = b
        mat[ib, ia] = b
    return idx, mat


def _bin_match_counts(
    nid: np.ndarray, tcode: np.ndarray, binmat: np.ndarray, bins: int
) -> np.ndarray:
    """(2*(bins+1))-bin histogram over all unordered row pairs of one block:
    code = 2*score_bin + is_match, score_bin from the broadcast quantized
    matrix, is_match = tcode equality. Chunked rectangular outer
    comparisons (the ``_pattern_counts`` memory discipline)."""
    n = len(nid)
    counts = np.zeros(2 * (bins + 1), dtype=np.int64)
    for i0 in range(0, n - 1, _PAIR_CHUNK):
        i1 = min(i0 + _PAIR_CHUNK, n - 1)
        ii = np.arange(i0, i1)
        jj = np.arange(i0 + 1, n)
        tri = jj[None, :] > ii[:, None]
        sb = binmat[nid[ii][:, None], nid[jj][None, :]].astype(np.int64)
        mt = (tcode[ii][:, None] == tcode[jj][None, :]).astype(np.int64)
        code = (2 * sb + mt)[tri]
        counts += np.bincount(code, minlength=2 * (bins + 1))
    return counts


def q_match_roc(sf_dir: str, bins: int = ROC_BINS):
    """Threshold sweep (the match-classification tuning curve): over the
    ``q_match_patterns`` blocked pairs with truth = ``p_type`` equality,
    report — for every candidate threshold t = b/bins — the confusion
    counts and precision/recall of the rule "match iff jaro_winkler(name)
    >= t". Choosing the FS classification threshold from exactly this
    curve is the standard last step of probabilistic linkage tuning.

    Distribution: identical shape to ``q_match_patterns`` — the broadcast
    vocabulary matrix is QUANTIZED scores (floor(jw*bins), bit-identical
    to the oracle because both floor the same IEEE product), each block
    folds its pairs into a 2*(bins+1)-bin bincount partial, one tiny
    ``grouped_sums`` merges them, and the cumulative tp/fp/fn + the two
    single-division ratios are a driver-side closed form over <=bins+1
    rows. The curve is exact — no sampling, no caps — at the cost of one
    histogram pass, which is the minimum possible.

    Rows with tp+fp = 0 (no pair predicted positive at that threshold)
    are omitted: precision is undefined there (the oracle's NULL).
    """
    names = sorted(
        distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
        .to_pandas()["p_name"]
        .astype(str)
        .tolist()
    )
    idx, mat = ray.get(_jw_bin_matrix.remote(names, bins))
    idx_ref, mat_ref = broadcast(idx), broadcast(mat)

    ds = read(sf_dir, "part", ["p_name", "p_brand", "p_type"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "ch": pd.Series([], dtype=str),
                    "brand": pd.Series([], dtype=str),
                    "nid": pd.Series([], dtype=np.int64),
                    "ptype": pd.Series([], dtype=str),
                }
            )
        lookup = ray.get(idx_ref)
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "brand": df["p_brand"].astype(str),
                "nid": nm.map(lookup).to_numpy(np.int64),
                "ptype": df["p_type"].astype(str),
            }
        )

    part_schema = pa.schema(
        [("bin", pa.int64()), ("nm", pa.int64()), ("nn", pa.int64())]
    )

    def block_hist(g: pd.DataFrame) -> pa.Table:
        counts = np.zeros(2 * (bins + 1), dtype=np.int64)
        if len(g) >= 2:
            counts = _bin_match_counts(
                g["nid"].to_numpy(np.int64),
                pd.factorize(g["ptype"])[0],
                ray.get(mat_ref),
                bins,
            )
        nm = counts[1::2]
        nn = counts[0::2]
        keep = (nm > 0) | (nn > 0)
        b = np.arange(bins + 1, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(b[keep], pa.int64()),
                pa.array(nm[keep], pa.int64()),
                pa.array(nn[keep], pa.int64()),
            ],
            schema=part_schema,
        )

    hist = (
        grouped_sums(
            ds.map_batches(slim, batch_format="pandas")
            .groupby(["ch", "brand"])
            .map_groups(block_hist, batch_format="pandas"),
            ["bin"],
            sums={"nm": "nm", "nn": "nn"},
        )
        .to_pandas()
        .set_index("bin")
        .reindex(range(bins + 1), fill_value=0)
    )
    nm = hist["nm"].to_numpy(np.int64)
    nn = hist["nn"].to_numpy(np.int64)
    total_match = nm.sum()
    tp = np.cumsum(nm[::-1])[::-1]  # pairs with bin >= b that are matches
    fp = np.cumsum(nn[::-1])[::-1]
    b = np.arange(bins + 1, dtype=np.int64)
    keep = (tp + fp) > 0
    out = pd.DataFrame(
        {
            "threshold": b[keep].astype(np.float64) / np.float64(bins),
            "tp": tp[keep],
            "fp": fp[keep],
            "fn": total_match - tp[keep],
            "prec": tp[keep].astype(np.float64)
            / (tp[keep] + fp[keep]).astype(np.float64),
            "rec": tp[keep].astype(np.float64) / np.float64(total_match),
        }
    )
    return rd.from_pandas(out)


# --- one-to-one matching + pair feature vectors (round 4e) -------------------

MUTUAL_JW_THRESHOLD = 0.8


def q_mutual_best_pairs(
    sf_dir: str,
    threshold: float = MUTUAL_JW_THRESHOLD,
    max_len_diff: int = 3,
    len_band: int = 4,
):
    """One-to-one ER matching by MUTUAL BEST match (the reciprocal-nearest-
    neighbor assignment step that turns a many-many candidate graph into a
    1:1 linkage, cf. the reference's keep-longest / highest-score pick at
    2nd Place/submission/second_stage_postprocess.py:43-91): within the
    fuzzy_name_pairs blocking predicate (same first char, length diff ≤
    ``max_len_diff``), each name's best partner is its JW-argmax (ties →
    lexicographically smallest partner); a pair is emitted iff the choice
    is reciprocal AND its JW ≥ ``threshold``.

    Scale shape: three slim exchanges, none carrying records — (1) the
    fuzzy dual-band block shuffle over (char, band, name); per block BOTH
    directed (name, cand, jw) rows are emitted for length-compatible
    pairs; (2) a name-keyed hash-bucket argmax (vectorized sort +
    drop_duplicates per bucket — dual-band duplicate candidacies collapse
    here, same jw on both copies); (3) a canonical-pair-keyed bucket where
    mutuality = both directions present (best is unique per name, so a
    pair key holds ≤ 2 rows). JW doubles never cross the oracle boundary
    unrounded-compared: the kernel is property-pinned bit-equal to
    DuckDB's jaro_winkler_similarity."""
    if len_band <= max_len_diff:
        raise ValueError("len_band must exceed max_len_diff for exact blocking")
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def keys(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        out = pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    directed_schema = pa.schema(
        [("name", pa.string()), ("cand", pa.string()), ("jw", pa.float64())]
    )

    def directed(g: pd.DataFrame) -> pa.Table:
        nm = g["p_name"].to_numpy(object)
        ln = g["ln"].to_numpy(np.int64)
        n = len(g)
        a_out: list = []
        b_out: list = []
        s_out: list = []
        if n >= 2:
            ia, ib = np.triu_indices(n, k=1)
            keep = np.abs(ln[ia] - ln[ib]) <= max_len_diff
            for i, j in zip(ia[keep], ib[keep]):
                if nm[i] == nm[j]:
                    continue
                s = jaro_winkler(nm[i], nm[j])
                a_out += [nm[i], nm[j]]
                b_out += [nm[j], nm[i]]
                s_out += [s, s]
        return pa.Table.from_arrays(
            [
                pa.array(a_out, pa.string()),
                pa.array(b_out, pa.string()),
                pa.array(s_out, pa.float64()),
            ],
            schema=directed_schema,
        )

    cand = (
        names.map_batches(keys, batch_format="pandas")
        .groupby(["ch", "band"])
        .map_groups(directed, batch_format="pandas")
    )

    n_buckets = default_buckets()

    def name_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(subset=["name", "cand"])
        h = pd.util.hash_pandas_object(d["name"], index=False).to_numpy()
        d = d.copy()
        d["_nb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(d, preserve_index=False)

    best_schema = pa.schema(
        [("name", pa.string()), ("cand", pa.string()), ("jw", pa.float64())]
    )

    def bucket_best(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=["name", "cand"])
        g = g.sort_values(
            ["name", "jw", "cand"], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(subset=["name"], keep="first")
        return pa.Table.from_arrays(
            [
                pa.array(g["name"].to_numpy(object), pa.string()),
                pa.array(g["cand"].to_numpy(object), pa.string()),
                pa.array(g["jw"].to_numpy(np.float64), pa.float64()),
            ],
            schema=best_schema,
        )

    best = (
        cand.map_batches(name_bucket, batch_format="pandas")
        .groupby("_nb")
        .map_groups(bucket_best, batch_format="pandas")
    )

    def pair_bucket(df: pd.DataFrame) -> pa.Table:
        a = df["name"].astype(str)
        b = df["cand"].astype(str)
        lo = np.where(a <= b, a, b)
        hi = np.where(a <= b, b, a)
        out = pd.DataFrame(
            {"name_a": lo, "name_b": hi, "jw": df["jw"].to_numpy(np.float64)}
        )
        h = pd.util.hash_pandas_object(
            out["name_a"] + "\x00" + out["name_b"], index=False
        ).to_numpy()
        out["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    mutual_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])

    def bucket_mutual(g: pd.DataFrame) -> pa.Table:
        counts = g.groupby(["name_a", "name_b"], as_index=False).agg(
            n=("jw", "size"), jw=("jw", "max")
        )
        keep = counts[(counts["n"] == 2) & (counts["jw"] >= threshold)]
        return pa.Table.from_arrays(
            [
                pa.array(keep["name_a"].to_numpy(object), pa.string()),
                pa.array(keep["name_b"].to_numpy(object), pa.string()),
            ],
            schema=mutual_schema,
        )

    return (
        best.map_batches(pair_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_mutual, batch_format="pandas")
    )


JW_UBIN_SCALE = 1_000_000


def q_pair_features(
    sf_dir: str,
    max_len_diff: int = 3,
    len_band: int = 4,
    block_cap: int = FUZZY_BLOCK_CAP,
):
    """Candidate-pair FEATURE VECTORS — the input frame of a learned match
    rule (Fellegi-Sunter weights / any classifier): for every blocked
    candidate pair (the fuzzy_name_pairs predicate), the integer feature
    tuple (levenshtein, floor(jw x 1e6), shared-token count, token-union
    count, len_a, len_b). All features cross the oracle boundary as exact
    integers; the JW microbin is floor of a property-pinned double, so
    bit-stable vs DuckDB.

    Scale shape: identical to fuzzy_name_pairs — vocabulary-bounded blocks
    under the dual-band exact blocking, features computed per surviving
    pair inside the block, one distinct pass on the canonical pair key."""
    if len_band <= max_len_diff:
        raise ValueError("len_band must exceed max_len_diff for exact blocking")
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def keys(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        out = pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    feat_schema = pa.schema(
        [
            ("name_a", pa.string()),
            ("name_b", pa.string()),
            ("lev", pa.int64()),
            ("jw_ubin", pa.int64()),
            ("tok_inter", pa.int64()),
            ("tok_union", pa.int64()),
            ("len_a", pa.int64()),
            ("len_b", pa.int64()),
        ]
    )

    def feats(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "p_name", "pair_features", block_cap)
        nm = g["p_name"].to_numpy(object)
        ln = g["ln"].to_numpy(np.int64)
        n = len(g)
        rows: list = []
        if n >= 2:
            ia, ib = np.triu_indices(n, k=1)
            keep = np.abs(ln[ia] - ln[ib]) <= max_len_diff
            for i, j in zip(ia[keep], ib[keep]):
                a, b = (nm[i], nm[j]) if nm[i] <= nm[j] else (nm[j], nm[i])
                if a == b:
                    continue
                ta, tb = set(a.split(" ")), set(b.split(" "))
                rows.append(
                    (
                        a,
                        b,
                        levenshtein(a, b),
                        int(np.floor(jaro_winkler(a, b) * JW_UBIN_SCALE)),
                        len(ta & tb),
                        len(ta | tb),
                        len(a),
                        len(b),
                    )
                )
        cols = list(zip(*rows)) if rows else [[] for _ in feat_schema]
        return pa.Table.from_arrays(
            [
                pa.array(list(cols[k]), feat_schema.field(k).type)
                for k in range(len(feat_schema))
            ],
            schema=feat_schema,
        )

    cand = (
        names.map_batches(keys, batch_format="pandas")
        .groupby(["ch", "band"])
        .map_groups(feats, batch_format="pandas")
    )

    n_buckets = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = df.drop_duplicates(subset=["name_a", "name_b"])
        h = pd.util.hash_pandas_object(
            out["name_a"] + "\x00" + out["name_b"], index=False
        ).to_numpy()
        out = out.copy()
        out["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_dedup(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(subset=["name_a", "name_b"]).drop(columns=["_pb"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        cand.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


PHONETIC_BLOCK_CAP = 4096


def q_phonetic_pairs(sf_dir: str, block_cap: int = PHONETIC_BLOCK_CAP):
    """Phonetic blocking (the third classic blocking discipline after
    standard blocking and sorted-neighborhood, Christen ch.4): distinct
    part names keyed by their American-Soundex code; every same-code pair
    is a candidate. Misspellings that preserve pronunciation land in the
    same block — the recall complement to the character-level n-gram and
    length-band blockers.

    Scale shape: the shuffle carries (code, name) only — one row per
    distinct name, vocabulary-bounded; blocks over ``block_cap`` truncate
    deterministically with a logged drop (the `_cap_block` discipline);
    pairs are unique by construction (one code per name → no dual
    emission, no distinct pass needed)."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def keys(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        return pa.Table.from_arrays(
            [
                pa.array([soundex(s) for s in nm], pa.string()),
                pa.array(nm.to_numpy(object), pa.string()),
            ],
            schema=pa.schema([("code", pa.string()), ("p_name", pa.string())]),
        )

    pair_schema = pa.schema(
        [("code", pa.string()), ("name_a", pa.string()), ("name_b", pa.string())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "p_name", "phonetic", block_cap)
        nm = np.sort(g["p_name"].to_numpy(object))
        code = g["code"].iloc[0] if len(g) else ""
        a_out: list = []
        b_out: list = []
        n = len(nm)
        if n >= 2:
            ia, ib = np.triu_indices(n, k=1)
            a_out = nm[ia].tolist()
            b_out = nm[ib].tolist()
        return pa.Table.from_arrays(
            [
                pa.array([code] * len(a_out), pa.string()),
                pa.array(a_out, pa.string()),
                pa.array(b_out, pa.string()),
            ],
            schema=pair_schema,
        )

    return (
        names.map_batches(keys, batch_format="pandas")
        .groupby("code")
        .map_groups(pairs, batch_format="pandas")
    )


# --- cluster-quality evaluation -----------------------------------------------

def q_cluster_metrics(sf_dir: str):
    """Pairwise cluster-quality evaluation (precision / recall / F1 over
    record pairs, Menestrina et al. PVLDB'10 "Evaluating entity resolution
    results") of a predicted clustering against gold labels — the exact
    metric family the engine's own acceptance bar is stated in (pairwise
    F1 vs reference entity clusters; BASELINE.json `metric`). Predicted
    cluster = first name token, gold = ``p_type`` (the synthetic stand-in
    for clerical truth used by q_match_weights/q_blocking_metrics).

    - ``tp_pairs``   = Σ_cells C(n_ij, 2)  (same pred AND same gold)
    - ``pred_pairs`` = Σ_pred  C(n_i·, 2)  (pairs the clustering asserts)
    - ``gold_pairs`` = Σ_gold  C(n_·j, 2)  (pairs the truth asserts)
    - precision = tp/pred, recall = tp/gold, f1 = 2pr/(p+r)

    Scale shape (the q_blocking_metrics discipline): NO pair is ever
    materialized — ONE ``grouped_sums`` count pass at the finest
    (pred, gold) key, whose cardinality is the product of two
    dictionary-bounded attributes, then every marginal and the pair
    arithmetic n(n-1)/2 derive driver-side from that tiny contingency
    table. Exact int64 to ~4.3e9 rows per cell; floats are SINGLE
    divisions of exact integers (and one 2pr/(p+r) formed identically to
    the oracle expression), so the compare is bit-exact."""

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "pred": nm.str.split(" ", n=1).str[0],
                "gold": df["p_type"].astype(str),
            }
        )

    ds = read(sf_dir, "part", ["p_name", "p_type"]).map_batches(
        keyed, batch_format="pandas"
    )
    c = grouped_sums(ds, ["pred", "gold"], sums={}, count_as="n").to_pandas()

    def pair_sum(n: pd.Series) -> int:
        v = n.to_numpy(np.int64)
        return int((v * (v - 1) // 2).sum())

    tp = pair_sum(c["n"])
    pred_pairs = pair_sum(c.groupby("pred")["n"].sum())
    gold_pairs = pair_sum(c.groupby("gold")["n"].sum())
    p = np.float64(tp) / np.float64(pred_pairs)
    r = np.float64(tp) / np.float64(gold_pairs)
    out = pd.DataFrame(
        [
            {
                "n_records": np.int64(c["n"].sum()),
                "tp_pairs": np.int64(tp),
                "pred_pairs": np.int64(pred_pairs),
                "gold_pairs": np.int64(gold_pairs),
                "pairwise_precision": p,
                "pairwise_recall": r,
                "pairwise_f1": np.float64(2.0) * p * r / (p + r),
            }
        ]
    )
    return rd.from_pandas(out)


# --- canopy blocking ----------------------------------------------------------

CANOPY_JW_THRESHOLD = 0.7
CANOPY_BLOCK_CAP = 4096


def q_canopy_pairs(
    sf_dir: str,
    threshold: float = CANOPY_JW_THRESHOLD,
    block_cap: int = CANOPY_BLOCK_CAP,
):
    """Canopy blocking (McCallum/Nigam/Ungar KDD'00): a CHEAP distance —
    here shared-rarest-token — assigns each distinct part name to exactly
    one canopy (its minimum-document-frequency token, ties broken
    lexicographically); the EXPENSIVE distance (Jaro-Winkler ≥
    ``threshold``) verifies only within-canopy pairs. The fourth classic
    blocking discipline in the module after standard / sorted-neighborhood
    / phonetic blocking — df-driven assignment is what distinguishes it:
    hot tokens (the skew hazard of naive token blocking) are by definition
    NOT the rarest token of their names, so posting-list explosion is
    structurally avoided rather than capped after the fact.

    Scale shape: token df is a ``grouped_sums`` over the (name, token)
    explode — vocabulary-bounded output, broadcast once via ``ray.put``
    (documented assumption: token vocab ≪ corpus, the dictionary-bounded
    small side; for open vocabularies ship only tokens under a df ceiling
    — names whose every token is hot would then fall back to a hash-of-
    name singleton canopy). Canopy assignment is a vectorized explode +
    merge + stable-sort drop_duplicates per batch; pair emission is the
    capped phonetic-block kernel, one shuffle carrying (canopy, name)."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def name_tokens(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        out = pd.DataFrame({"p_name": nm, "tok": nm.str.split(" ")})
        out = out.explode("tok", ignore_index=True)
        return out.drop_duplicates()

    toks = names.map_batches(name_tokens, batch_format="pandas")
    # names are DISTINCT upstream, so per-(name, tok) rows are unique and
    # this counts true document frequency
    df_tbl = grouped_sums(toks, ["tok"], sums={}, count_as="df").to_pandas()
    df_ref = broadcast(dict(zip(df_tbl["tok"], df_tbl["df"].astype(np.int64))))

    def assign(df: pd.DataFrame) -> pa.Table:
        dfm = ray.get(df_ref)
        t = name_tokens(df)
        t["df"] = t["tok"].map(dfm).astype(np.int64)
        t = t.sort_values(["p_name", "df", "tok"], kind="mergesort")
        t = t.drop_duplicates(subset=["p_name"], keep="first")
        return pa.Table.from_arrays(
            [
                pa.array(t["tok"].to_numpy(object), pa.string()),
                pa.array(t["p_name"].to_numpy(object), pa.string()),
            ],
            schema=pa.schema([("canopy", pa.string()), ("p_name", pa.string())]),
        )

    pair_schema = pa.schema(
        [
            ("canopy", pa.string()),
            ("name_a", pa.string()),
            ("name_b", pa.string()),
            ("jw", pa.float64()),
        ]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "p_name", "canopy", block_cap)
        nm = np.sort(g["p_name"].to_numpy(object))
        canopy = g["canopy"].iloc[0] if len(g) else ""
        a_out: list = []
        b_out: list = []
        s_out: list = []
        n = len(nm)
        if n >= 2:
            ia, ib = np.triu_indices(n, k=1)
            for i, j in zip(ia, ib):
                s = jaro_winkler(nm[i], nm[j])
                if s >= threshold:
                    a_out.append(nm[i])
                    b_out.append(nm[j])
                    s_out.append(s)
        return pa.Table.from_arrays(
            [
                pa.array([canopy] * len(a_out), pa.string()),
                pa.array(a_out, pa.string()),
                pa.array(b_out, pa.string()),
                pa.array(s_out, pa.float64()),
            ],
            schema=pair_schema,
        )

    return (
        names.map_batches(assign, batch_format="pandas")
        .groupby("canopy")
        .map_groups(pairs, batch_format="pandas")
    )


# --- incremental linkage ------------------------------------------------------

LINK_INC_THRESHOLD = 0.8
LINK_INC_MOD = 10  # p_partkey % MOD == 0 → the "new batch" split


def q_link_increment(
    sf_dir: str,
    threshold: float = LINK_INC_THRESHOLD,
    max_len_diff: int = 3,
    len_band: int = 4,
):
    """Incremental linkage (the streaming-ER discipline, Christen ch.9 /
    Gruenheid et al. PVLDB'14): link a NEW batch of records against an
    existing clustered BASE without re-resolving the base. The
    deterministic split is ``p_partkey % 10 == 0`` → new, else base (the
    10% increment a daily ingest would bring). Each new record takes its
    best Jaro-Winkler match ≥ ``threshold`` among base names inside the
    fuzzy blocking predicate (same first char, length diff ≤
    ``max_len_diff``); unmatched new records come through with
    ``matched_name = '' / jw = 0.0`` — they found NO existing entity and
    would seed new clusters.

    Scale shape: base records never pairwise-compare each other (the whole
    point of incremental ER — cost is |new| × per-block base fan-in, not
    |base|²). Blocking is the mutual_best dual-band trick with the DUAL
    emission on the BASE side only (new rows ship once); per (char, band)
    block a python-loop JW over the new×base cross (len-filtered, capped
    base side); best-match is the hash-bucketed vectorized argmax; the
    unmatched passthrough is a bucketed left merge on (p_partkey, p_name)
    — three slim exchanges, none carrying full records."""
    if len_band <= max_len_diff:
        raise ValueError("len_band must exceed max_len_diff for exact blocking")
    part = read(sf_dir, "part", ["p_partkey", "p_name"])

    def split_new(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].to_numpy(np.int64)
        d = df[k % LINK_INC_MOD == 0]
        return pd.DataFrame(
            {
                "p_partkey": d["p_partkey"].to_numpy(np.int64),
                "p_name": d["p_name"].astype(str),
            }
        )

    new = part.map_batches(split_new, batch_format="pandas")

    def split_base(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].to_numpy(np.int64)
        return pd.DataFrame({"p_name": df["p_name"].astype(str)[k % LINK_INC_MOD != 0]})

    base = distinct_column(
        part.map_batches(split_base, batch_format="pandas"), "p_name"
    )

    def base_keys(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        return pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_partkey": np.int64(-1),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
            }
        )

    def new_keys(df: pd.DataFrame) -> pd.DataFrame:
        # dual emission on BOTH sides: copies at band and band+1 co-locate
        # iff the bands differ by ≤1, which covers every len diff ≤
        # max_len_diff < len_band pair; duplicate candidacies carry equal
        # jw and collapse at the argmax
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        pk = df["p_partkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_partkey": np.concatenate([pk, pk]),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
            }
        )

    both = new.map_batches(new_keys, batch_format="pandas").union(
        base.map_batches(base_keys, batch_format="pandas")
    )

    cand_schema = pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_name", pa.string()),
            ("base_name", pa.string()),
            ("jw", pa.float64()),
        ]
    )

    def block_cands(g: pd.DataFrame) -> pa.Table:
        is_new = g["p_partkey"].to_numpy(np.int64) >= 0
        nw = g[is_new]
        bs = g[~is_new]
        k_out: list = []
        a_out: list = []
        b_out: list = []
        s_out: list = []
        if len(nw) and len(bs):
            bnm = bs["p_name"].to_numpy(object)
            bln = bs["ln"].to_numpy(np.int64)
            for pk, nm, ln in zip(
                nw["p_partkey"].to_numpy(np.int64),
                nw["p_name"].to_numpy(object),
                nw["ln"].to_numpy(np.int64),
            ):
                ok = np.abs(bln - ln) <= max_len_diff
                for cand in bnm[ok]:
                    s = jaro_winkler(nm, cand)
                    if s >= threshold:
                        k_out.append(pk)
                        a_out.append(nm)
                        b_out.append(cand)
                        s_out.append(s)
        return pa.Table.from_arrays(
            [
                pa.array(k_out, pa.int64()),
                pa.array(a_out, pa.string()),
                pa.array(b_out, pa.string()),
                pa.array(s_out, pa.float64()),
            ],
            schema=cand_schema,
        )

    cand = both.groupby(["ch", "band"]).map_groups(
        block_cands, batch_format="pandas"
    )

    n_buckets = default_buckets()

    def key_bucket(df: pd.DataFrame, key: str = "p_partkey") -> pd.DataFrame:
        out = df.copy()
        h = pd.util.hash_pandas_object(out[key], index=False).to_numpy()
        out["_kb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def bucket_best(g: pd.DataFrame) -> pa.Table:
        # dual-band duplicate candidacies carry identical jw; argmax with
        # (jw desc, base_name asc) tie-break collapses them
        g = g.sort_values(
            ["p_partkey", "jw", "base_name"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(subset=["p_partkey"], keep="first")
        return pa.Table.from_arrays(
            [
                pa.array(g["p_partkey"].to_numpy(np.int64), pa.int64()),
                pa.array(g["p_name"].to_numpy(object), pa.string()),
                pa.array(g["base_name"].to_numpy(object), pa.string()),
                pa.array(g["jw"].to_numpy(np.float64), pa.float64()),
            ],
            schema=cand_schema,
        )

    best = (
        cand.map_batches(key_bucket, batch_format="pandas")
        .groupby("_kb")
        .map_groups(bucket_best, batch_format="pandas")
    )

    out_schema = pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_name", pa.string()),
            ("matched_name", pa.string()),
            ("jw", pa.float64()),
        ]
    )

    def bucket_attach(g: pd.DataFrame) -> pa.Table:
        nw = g[g["base_name"].isna()][["p_partkey", "p_name"]]
        m = g[g["base_name"].notna()][["p_partkey", "base_name", "jw"]]
        j = nw.merge(m, on="p_partkey", how="left")
        matched = j["base_name"].fillna("")
        jw = j["jw"].fillna(0.0)
        return pa.Table.from_arrays(
            [
                pa.array(j["p_partkey"].to_numpy(np.int64), pa.int64()),
                pa.array(j["p_name"].to_numpy(object), pa.string()),
                pa.array(matched.to_numpy(object), pa.string()),
                pa.array(jw.to_numpy(np.float64), pa.float64()),
            ],
            schema=out_schema,
        )

    def new_tagged(df: pd.DataFrame) -> pa.Table:
        d = split_new(df)
        # explicit schema: an all-null object column would otherwise infer
        # Arrow null type and break the union with `best`'s string column
        return pa.Table.from_arrays(
            [
                pa.array(d["p_partkey"].to_numpy(np.int64), pa.int64()),
                pa.array(d["p_name"].to_numpy(object), pa.string()),
                pa.array([None] * len(d), pa.string()),
                pa.array([None] * len(d), pa.float64()),
            ],
            schema=cand_schema,
        )

    tagged_new = part.map_batches(new_tagged, batch_format="pandas")
    return (
        tagged_new.union(best)
        .map_batches(key_bucket, batch_format="pandas")
        .groupby("_kb")
        .map_groups(bucket_attach, batch_format="pandas")
    )


# --- FS decision rule: classify blocked pairs ---------------------------------

CLASSIFY_BLOCK_CAP = 4096


def q_match_classify(
    sf_dir: str,
    threshold: float = MATCH_JW_THRESHOLD,
    size_tol: int = MATCH_SIZE_TOL,
    block_cap: int = CLASSIFY_BLOCK_CAP,
    weights: pd.DataFrame | None = None,
):
    """Fellegi-Sunter DECISION rule (JASA'69 §2 — the classification step
    that the m/u estimation exists for): every blocked part pair is
    labeled match/non-match by its agreement pattern's likelihood ratio

        Π_f  [m_f / u_f]           if field f agrees
        Π_f  [(1-m_f) / (1-u_f)]   if field f disagrees      ≥ 1 → match

    with m/u taken from ``q_match_weights`` (labeled-truth estimation over
    the SAME blocked pair population, so estimation and decision see one
    distribution). The ratio compare is EXACT: m/u are ratios of int64
    counts, so the ≥1 test cross-multiplies to an integer product
    comparison evaluated in arbitrary-precision Python ints driver-side —
    once per 2^2 patterns, never per pair (the oracle mirrors it in
    HUGEINT). No float ever enters the decision.

    Scale shape: estimation is the histogram pass (its own doc); the
    decision pass re-uses the broadcast JW vocabulary matrix and ships the
    4-entry pattern→decision table with it, so each (first-char, brand)
    block emits its pairs by the chunked rectangular outer comparisons of
    ``_pattern_counts`` — integer fancy-indexing, no per-pair Python —
    already classified. Output: (p_partkey_a, p_partkey_b, agree_name,
    agree_size, is_match) with partkey-canonical ordering."""
    wts = (weights if weights is not None
           else q_match_weights(sf_dir, threshold, size_tol).to_pandas())
    w = {r.field: r for r in wts.itertuples()}
    B = int(w["name"].n_match)
    D = int(w["name"].n_nonmatch)

    def field_ratio(field: str, agree: int) -> tuple[int, int]:
        a = int(w[field].n_match_agree)
        c = int(w[field].n_nonmatch_agree)
        num = (a if agree else B - a) * D
        den = (c if agree else D - c) * B
        return num, den

    decision = np.zeros(4, dtype=np.int64)
    for an in (0, 1):
        for asz in (0, 1):
            n1, d1 = field_ratio("name", an)
            n2, d2 = field_ratio("size", asz)
            decision[2 * an + asz] = np.int64(n1 * n2 >= d1 * d2)

    names = sorted(
        distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
        .to_pandas()["p_name"]
        .astype(str)
        .tolist()
    )
    idx, mat = ray.get(_jw_agree_matrix.remote(names, threshold))
    idx_ref, mat_ref = broadcast(idx), broadcast(mat)
    dec_ref = broadcast(decision)

    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_size"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(idx_ref)
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "brand": df["p_brand"].astype(str),
                "pk": df["p_partkey"].to_numpy(np.int64),
                "nid": nm.map(lookup).to_numpy(np.int64),
                "size": df["p_size"].to_numpy(np.int64),
            }
        )

    out_schema = pa.schema(
        [
            ("p_partkey_a", pa.int64()),
            ("p_partkey_b", pa.int64()),
            ("agree_name", pa.int64()),
            ("agree_size", pa.int64()),
            ("is_match", pa.int64()),
        ]
    )

    def block_pairs(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "pk", "match_classify", block_cap)
        # partkey-sorted so chunk emission is already canonical (a < b)
        g = g.sort_values("pk", kind="mergesort")
        pk = g["pk"].to_numpy(np.int64)
        nid = g["nid"].to_numpy(np.int64)
        sz = g["size"].to_numpy(np.int64)
        mat = ray.get(mat_ref)
        dec = ray.get(dec_ref)
        n = len(g)
        pa_out: list = []
        pb_out: list = []
        an_out: list = []
        as_out: list = []
        for i0 in range(0, max(n - 1, 0), _PAIR_CHUNK):
            i1 = min(i0 + _PAIR_CHUNK, n - 1)
            ii = np.arange(i0, i1)
            jj = np.arange(i0 + 1, n)
            tri = jj[None, :] > ii[:, None]
            an = mat[nid[ii][:, None], nid[jj][None, :]].astype(np.int64)
            asz = (np.abs(sz[ii][:, None] - sz[jj][None, :]) <= size_tol).astype(
                np.int64
            )
            ia, jb = np.nonzero(tri)
            pa_out.append(pk[ii][ia])
            pb_out.append(pk[jj][jb])
            an_out.append(an[tri])
            as_out.append(asz[tri])
        if pa_out:
            pka = np.concatenate(pa_out)
            pkb = np.concatenate(pb_out)
            ann = np.concatenate(an_out)
            ass = np.concatenate(as_out)
        else:
            pka = pkb = ann = ass = np.empty(0, dtype=np.int64)
        ismatch = dec[2 * ann + ass]
        return pa.Table.from_arrays(
            [
                pa.array(pka, pa.int64()),
                pa.array(pkb, pa.int64()),
                pa.array(ann, pa.int64()),
                pa.array(ass, pa.int64()),
                pa.array(ismatch, pa.int64()),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(slim, batch_format="pandas")
        .groupby(["ch", "brand"])
        .map_groups(block_pairs, batch_format="pandas")
    )


# --- suffix blocking ----------------------------------------------------------

SUFFIX_MIN_LEN = 5
SUFFIX_BLOCK_MAX = 50


def q_suffix_pairs(
    sf_dir: str,
    min_len: int = SUFFIX_MIN_LEN,
    block_max: int = SUFFIX_BLOCK_MAX,
):
    """Suffix-array blocking (Aizawa & Oyama 2005 — the module's FIFTH
    blocking discipline): every distinct part name emits ALL its suffixes
    of length ≥ ``min_len``; a suffix whose block exceeds ``block_max``
    members is DISCARDED (not capped — the method's own frequency-pruning
    rule, which is what makes long rare suffixes matter: when the short
    common suffix is pruned, a pair can still co-occur under a longer
    one); candidate pairs are the distinct same-suffix name pairs. The
    discard rule is part of the DECLARED semantics, so the oracle
    implements it identically — no cap divergence.

    Scale shape: the explode is per-offset vectorized slicing (the loop is
    over ≤ max-name-length offsets, never over rows); the shuffle carries
    (suffix, name) only; block sizes are bounded by ``block_max`` BY
    SEMANTICS, so per-block pair emission is O(block_max²) worst-case and
    the distinct pass is the shared hash-bucketed pair dedup."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def sufs(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        out_s: list = []
        out_n: list = []
        max_start = int(ln.max() - min_len + 1) if len(ln) else 0
        for i in range(max_start):
            keep = ln - i >= min_len
            out_s.append(nm[keep].str.slice(i))
            out_n.append(nm[keep])
        if out_s:
            s = pd.concat(out_s, ignore_index=True)
            n = pd.concat(out_n, ignore_index=True)
        else:
            s = n = pd.Series([], dtype=str)
        return pa.Table.from_arrays(
            [
                pa.array(s.to_numpy(object), pa.string()),
                pa.array(n.to_numpy(object), pa.string()),
            ],
            schema=pa.schema([("suf", pa.string()), ("p_name", pa.string())]),
        )

    pair_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])

    def pairs(g: pd.DataFrame) -> pa.Table:
        a_out: list = []
        b_out: list = []
        n = len(g)
        if 2 <= n <= block_max:
            nm = np.sort(g["p_name"].to_numpy(object))
            ia, ib = np.triu_indices(n, k=1)
            a_out = nm[ia].tolist()
            b_out = nm[ib].tolist()
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.string()), pa.array(b_out, pa.string())],
            schema=pair_schema,
        )

    cand = (
        names.map_batches(sufs, batch_format="pandas")
        .groupby("suf")
        .map_groups(pairs, batch_format="pandas")
    )
    return _distinct_name_pairs(cand)


def q_monge_elkan_pairs(sf_dir: str):
    """Monge-Elkan token-set similarity (Monge & Elkan KDD'96 — the
    classic hybrid ER scorer: token-level Jaro-Winkler, set-level best
    match) over every unordered pair of DISTINCT part names, both
    directions, in exact integer micro-units. The reference verifies
    dictionary candidates with whole-string similarity (SURVEY §2.8);
    Monge-Elkan is the multi-token generalization used when fields are
    token sets (author lists, addresses, multi-word clinical surfaces).

    Plan — the bounded-dictionary all-pairs discipline (same as the
    flagship's broadcast concept side): the name DICTIONARY (distinct
    p_name — vocabulary-bounded, ~dozens here, ≤ catalog size at 100 TB)
    is computed distributively, collected ONCE, and broadcast via
    ray.put; pair generation then streams over the same distinct-name
    Dataset, each batch emitting pairs (x, y) for y > x against the
    broadcast vocabulary — every unordered pair exactly once, no
    shuffle, no driver-side pair loop. Records never pair; only
    dictionary entries do.

    Output integers only: per-direction quantize-then-sum micro scores
    (see functions/similarity.py::monge_elkan_micro) and token counts;
    the ME average (sum/n_tok) is the caller's single division."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
    vocab = sorted(names.to_pandas()["p_name"].astype(str))  # dictionary-bounded
    vocab_ref = broadcast(vocab)

    out_schema = pa.schema(
        [
            ("name_a", pa.string()),
            ("name_b", pa.string()),
            ("me_ab_micro", pa.int64()),
            ("me_ba_micro", pa.int64()),
            ("n_tok_a", pa.int64()),
            ("n_tok_b", pa.int64()),
        ]
    )

    class MePairs:
        def __init__(self):
            import bisect

            self.vocab = ray.get(vocab_ref)
            self.toks = [v.split(" ") for v in self.vocab]
            self.bisect = bisect

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            from ..functions.similarity import monge_elkan_micro

            a_col: list = []
            b_col: list = []
            ab: list = []
            ba: list = []
            na: list = []
            nb: list = []
            for a in df["p_name"].astype(str):
                ta = a.split(" ")
                # pairs (a, b) for every vocab entry strictly after a
                start = self.bisect.bisect_right(self.vocab, a)
                for j in range(start, len(self.vocab)):
                    b, tb = self.vocab[j], self.toks[j]
                    a_col.append(a)
                    b_col.append(b)
                    ab.append(monge_elkan_micro(ta, tb))
                    ba.append(monge_elkan_micro(tb, ta))
                    na.append(len(ta))
                    nb.append(len(tb))
            return pa.Table.from_arrays(
                [
                    pa.array(a_col, pa.string()),
                    pa.array(b_col, pa.string()),
                    pa.array(ab, pa.int64()),
                    pa.array(ba, pa.int64()),
                    pa.array(na, pa.int64()),
                    pa.array(nb, pa.int64()),
                ],
                schema=out_schema,
            )

    return names.map_batches(MePairs, batch_format="pandas", concurrency=(1, 8))


def q_bcubed_metrics(sf_dir: str):
    """B-cubed cluster-quality evaluation (Bagga & Baldwin '98; Amigo et
    al. IR'09 — the extrinsic clustering metric family complementing the
    pairwise P/R/F of ``q_cluster_metrics``). For every PREDICTED cluster
    i: B-cubed precision_i = avg over its items of |cell(i,j)|/|i| =
    (SUM_j n_ij^2) / n_i^2; for every GOLD class j the same expression is
    the per-class B-cubed recall. Predicted cluster = first name token,
    gold = ``p_type`` (the same synthetic truth stand-in q_cluster_metrics
    / q_match_weights use). One output row per cluster per side, so every
    score is a deterministic expression of exact integers — the global
    B-cubed P/R are item-weighted means of these rows and are left to the
    consumer (a float reduction whose order SQL does not pin).

    Scale shape: identical to q_cluster_metrics — NO pair and NO item ever
    materializes; ONE grouped_sums pass builds the (pred, gold)
    contingency table (cardinality = product of two dictionary-bounded
    attributes), and all marginals derive driver-side from that tiny
    table. sum_sq is exact int64 to ~3e9 rows per cell; the score is
    formed as float64(sum_sq) / (float64(n) * float64(n)) — written
    identically in the oracle SQL so the compare is bit-exact."""

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "pred": nm.str.split(" ", n=1).str[0],
                "gold": df["p_type"].astype(str),
            }
        )

    ds = read(sf_dir, "part", ["p_name", "p_type"]).map_batches(
        keyed, batch_format="pandas"
    )
    c = grouped_sums(ds, ["pred", "gold"], sums={}, count_as="n").to_pandas()
    c["sq"] = c["n"].to_numpy(np.int64) ** 2

    def side(col: str, name: str) -> pd.DataFrame:
        g = c.groupby(col, as_index=False).agg(
            n_records=("n", "sum"), sum_sq=("sq", "sum")
        )
        n = g["n_records"].to_numpy(np.int64)
        sq = g["sum_sq"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "side": name,
                "key": g[col].astype(str),
                "n_records": n,
                "sum_sq": sq,
                "score": sq.astype(np.float64)
                / (n.astype(np.float64) * n.astype(np.float64)),
            }
        )

    out = pd.concat(
        [side("pred", "pred"), side("gold", "gold")], ignore_index=True
    )
    return rd.from_pandas(out)


def q_canonical_names(sf_dir: str):
    """Record standardization — the first stage of every classic linkage
    pipeline (Fellegi-Sunter preprocessing; the reference normalizes
    surfaces before dictionary lookup, `1st Place/src/
    generate_annotations.py` lowercase/strip keys): canonical form =
    lowercase, tokenized on non-alphanumeric runs, tokens SORTED and
    re-joined — so token-order and punctuation variants of a name collapse
    to one key. Output: one row per canonical key with the distinct-name
    and record counts it absorbs.

    Scale shape: canonicalization is a stateless map (Arrow regex split;
    the per-row token sort is one np.lexsort over the exploded batch, not
    a per-row Python sort); the (canon, p_name) partial-count shuffle is
    bounded by the distinct-name vocabulary, and the final per-canon
    reduction is a grouped_sums over that dictionary-bounded stream."""
    ds = read(sf_dir, "part", ["p_name"])

    def canon(t: pa.Table) -> pd.DataFrame:
        low = pc.utf8_lower(t["p_name"])
        lists = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        toks = pc.filter(flat, keep).to_pandas().to_numpy()
        idx = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
        # one lexsort over the exploded batch orders every row's tokens
        order = np.lexsort((toks, idx))
        joined = (
            pd.Series(toks[order])
            .groupby(idx[order])
            .agg(" ".join)
            .reindex(range(t.num_rows), fill_value="")
        )
        return pd.DataFrame(
            {
                "canon": joined.to_numpy(),
                "p_name": t["p_name"].to_pandas().astype(str),
            }
        )

    pairs = grouped_sums(
        ds.map_batches(canon, batch_format="pyarrow"),
        ["canon", "p_name"],
        sums={},
        count_as="n",
    )
    out = grouped_sums(pairs, ["canon"], sums={"n_records": "n"}, count_as="n_names")
    return out.select_columns(["canon", "n_names", "n_records"])


def q_ari_metric(sf_dir: str):
    """Adjusted Rand Index (Hubert & Arabie '85) of the same predicted-vs-
    gold clustering q_cluster_metrics / q_bcubed_metrics evaluate — the
    chance-corrected pairwise agreement score, completing the standard
    ER-evaluation triple (pairwise P/R/F1, B-cubed, ARI).

    ARI = (tp - E[tp]) / (max_tp - E[tp]) with
    E[tp] = pred_pairs * gold_pairs / total_pairs and
    max_tp = (pred_pairs + gold_pairs) / 2.

    Scale shape: identical to q_cluster_metrics — ONE ``grouped_sums``
    contingency pass at the dictionary-bounded (pred, gold) key; every
    pair term derives driver-side as exact int64 n(n-1)/2 sums; the three
    float outputs are single expressions of those exact integers formed
    identically to the oracle SQL, so the compare is bit-exact."""

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "pred": nm.str.split(" ", n=1).str[0],
                "gold": df["p_type"].astype(str),
            }
        )

    ds = read(sf_dir, "part", ["p_name", "p_type"]).map_batches(
        keyed, batch_format="pandas"
    )
    c = grouped_sums(ds, ["pred", "gold"], sums={}, count_as="n").to_pandas()

    def pair_sum(n: pd.Series) -> int:
        v = n.to_numpy(np.int64)
        return int((v * (v - 1) // 2).sum())

    n_records = int(c["n"].sum())
    tp = pair_sum(c["n"])
    pred_pairs = pair_sum(c.groupby("pred")["n"].sum())
    gold_pairs = pair_sum(c.groupby("gold")["n"].sum())
    total_pairs = n_records * (n_records - 1) // 2
    expected = (
        np.float64(pred_pairs) * np.float64(gold_pairs) / np.float64(total_pairs)
    )
    max_tp = np.float64(pred_pairs + gold_pairs) / np.float64(2.0)
    out = pd.DataFrame(
        [
            {
                "n_records": np.int64(n_records),
                "tp_pairs": np.int64(tp),
                "pred_pairs": np.int64(pred_pairs),
                "gold_pairs": np.int64(gold_pairs),
                "expected_tp": expected,
                "ari": (np.float64(tp) - expected) / (max_tp - expected),
            }
        ]
    )
    return rd.from_pandas(out)


# --- exact-distance neighbor joins ---------------------------------------------


def q_edit_neighbors(sf_dir: str):
    """Exact edit-distance-1 self-join over distinct part names via the
    FastSS deletion neighborhood (Bocek et al. '07): every name emits
    itself plus its len(s) single-character deletions; ED(a,b) <= 1 implies
    a and b SHARE a variant (equal -> self; substitution at i -> both
    deletion-at-i variants; indel -> the longer one's deletion equals the
    shorter's self), so grouping by variant is a blocking scheme with NO
    false negatives — unlike the JW/phonetic blockers above whose recall
    is the declared predicate. Candidates are then verified with the exact
    Levenshtein kernel (shared, property-tested vs DuckDB).

    Scale shape: the variant shuffle carries (variant, name) — O(total
    chars) rows over the DISTINCT-name vocabulary, dictionary-bounded;
    deletions are generated per LENGTH CLASS with one numpy byte-matrix
    slice per deletion position (no per-string Python); pair emission
    loops only over variant groups with >= 2 members (collision count,
    not corpus size); the candidate set is deduped on the (name_a, name_b)
    key by a second slim ``grouped_sums`` shuffle before verification, so
    each pair is scored exactly once."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
    n_buckets = default_buckets()

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str).to_numpy(object)
        var_out: list = []
        name_out: list = []
        lens = np.array([len(s) for s in nm], dtype=np.int64)
        for L in np.unique(lens):
            grp = nm[lens == L]
            var_out.append(grp)  # the self variant
            name_out.append(grp)
            if L == 0:
                continue
            # byte matrix (names are ASCII in this schema; the fallback
            # below covers any non-ASCII batch with a per-string path)
            try:
                chars = np.frombuffer(
                    "".join(grp.tolist()).encode("ascii"), dtype="S1"
                ).reshape(len(grp), L)
            except UnicodeEncodeError:
                for s in grp:
                    for d in range(len(s)):
                        var_out.append(np.array([s[:d] + s[d + 1 :]], object))
                        name_out.append(np.array([s], object))
                continue
            cols = np.arange(L - 1)
            for d in range(int(L)):
                sub = np.ascontiguousarray(chars[:, cols + (cols >= d)])
                dels = np.char.decode(sub.view(f"S{L-1}").ravel(), "ascii")
                var_out.append(dels.astype(object))
                name_out.append(grp)
        v = np.concatenate(var_out) if var_out else np.array([], object)
        n = np.concatenate(name_out) if name_out else np.array([], object)
        g = pd.DataFrame({"variant": v, "p_name": n})
        h = pd.util.hash_pandas_object(g["variant"], index=False).to_numpy()
        g["_vb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return g

    pair_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        a_out: list = []
        b_out: list = []
        sizes = g.groupby("variant")["p_name"].nunique()
        hot = sizes[sizes >= 2].index
        for v in hot:
            mem = np.sort(g.loc[g["variant"] == v, "p_name"].unique().astype(object))
            ia, ib = np.triu_indices(len(mem), k=1)
            a_out.append(mem[ia])
            b_out.append(mem[ib])
        a = np.concatenate(a_out) if a_out else np.array([], object)
        b = np.concatenate(b_out) if b_out else np.array([], object)
        # Arrow output: empty object columns in pandas blocks trip Ray's
        # sampling size estimator (the distinct_column note)
        return pa.Table.from_arrays(
            [pa.array(a, pa.string()), pa.array(b, pa.string())],
            schema=pair_schema,
        )

    cand = (
        names.map_batches(variants, batch_format="pandas")
        .groupby("_vb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand = grouped_sums(cand, ["name_a", "name_b"], sums={}, count_as="n_shared")

    out_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("dist", pa.int64())]
    )

    def verify(df: pd.DataFrame) -> pa.Table:
        d = np.array(
            [levenshtein(a, b) for a, b in zip(df["name_a"], df["name_b"])],
            dtype=np.int64,
        )
        keep = d <= 1
        return pa.Table.from_arrays(
            [
                pa.array(df["name_a"].to_numpy(object)[keep], pa.string()),
                pa.array(df["name_b"].to_numpy(object)[keep], pa.string()),
                pa.array(d[keep], pa.int64()),
            ],
            schema=out_schema,
        )

    return cand.map_batches(verify, batch_format="pandas")


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy < 2.0 has no bitwise_count)."""
    x = x.astype(np.uint64)
    out = _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)]
    for shift in (16, 32, 48):
        out = out + _POP16[((x >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


HAMMING_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def q_hamming_neighbors(sf_dir: str, max_dist: int = 2):
    """Exact Hamming-distance join over 36-bit character-set fingerprints
    (bit i set iff the name contains alphabet char i): every distinct-name
    pair whose fingerprints differ in <= ``max_dist`` bits. The blocking is
    the classic multi-index Hamming pigeonhole (Norouzi et al. — and the
    band trick SimHash dedup rests on): the 36 bits split into
    ``max_dist + 1`` disjoint bands, and any pair within distance d <=
    max_dist must match EXACTLY on at least one band — a no-false-negative
    candidate scheme, verified by exact popcount(xor).

    Scale shape: fingerprints are 36 vectorized contains-scans per batch
    (alphabet-bounded, not corpus-bounded); the shuffle carries
    (band_key, name, mask) — 3 slim rows per distinct name; pair emission
    loops only over band groups with >= 2 members; candidates dedup on the
    pair key via ``grouped_sums`` (masks ride as functional keys), then one
    vectorized popcount verifies. Exact int64 end-to-end."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
    n_buckets = default_buckets()
    n_bands = max_dist + 1
    width = (len(HAMMING_ALPHABET) + n_bands - 1) // n_bands
    band_mask = (1 << width) - 1

    def masks(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        low = nm.str.lower()
        mask = np.zeros(len(df), dtype=np.int64)
        for i, ch in enumerate(HAMMING_ALPHABET):
            mask |= low.str.contains(ch, regex=False).to_numpy() << np.int64(i)
        rows = []
        for b in range(n_bands):
            band_val = (mask >> np.int64(b * width)) & np.int64(band_mask)
            rows.append(
                pd.DataFrame(
                    {
                        "band_key": (np.int64(b) << np.int64(40)) | band_val,
                        "p_name": nm.to_numpy(object),
                        "mask": mask,
                    }
                )
            )
        g = pd.concat(rows, ignore_index=True)
        g["_hb"] = (
            g["band_key"].to_numpy(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out: list = []
        b_out: list = []
        ma_out: list = []
        mb_out: list = []
        sizes = g.groupby("band_key")["p_name"].nunique()
        hot = sizes[sizes >= 2].index
        for v in hot:
            mem = g.loc[g["band_key"] == v, ["p_name", "mask"]].drop_duplicates(
                subset=["p_name"]
            )
            mem = mem.sort_values("p_name")
            nm = mem["p_name"].to_numpy(object)
            mk = mem["mask"].to_numpy(np.int64)
            ia, ib = np.triu_indices(len(nm), k=1)
            a_out.append(nm[ia])
            b_out.append(nm[ib])
            ma_out.append(mk[ia])
            mb_out.append(mk[ib])
        a = np.concatenate(a_out) if a_out else np.array([], object)
        b = np.concatenate(b_out) if b_out else np.array([], object)
        ma = np.concatenate(ma_out) if ma_out else np.array([], np.int64)
        mb = np.concatenate(mb_out) if mb_out else np.array([], np.int64)
        # Arrow output: empty object columns in pandas blocks trip Ray's
        # sampling size estimator (the distinct_column note)
        return pa.Table.from_arrays(
            [
                pa.array(a, pa.string()),
                pa.array(b, pa.string()),
                pa.array(ma, pa.int64()),
                pa.array(mb, pa.int64()),
            ],
            schema=pa.schema(
                [
                    ("name_a", pa.string()),
                    ("name_b", pa.string()),
                    ("mask_a", pa.int64()),
                    ("mask_b", pa.int64()),
                ]
            ),
        )

    cand = (
        names.map_batches(masks, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # masks are functions of the names, so keying on all four just dedups pairs
    cand = grouped_sums(
        cand, ["name_a", "name_b", "mask_a", "mask_b"], sums={}, count_as="n_bands"
    )

    out_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("dist", pa.int64())]
    )

    def verify(df: pd.DataFrame) -> pa.Table:
        d = _popcount64(
            df["mask_a"].to_numpy(np.int64) ^ df["mask_b"].to_numpy(np.int64)
        )
        keep = d <= max_dist
        return pa.Table.from_arrays(
            [
                pa.array(df["name_a"].to_numpy(object)[keep], pa.string()),
                pa.array(df["name_b"].to_numpy(object)[keep], pa.string()),
                pa.array(d[keep], pa.int64()),
            ],
            schema=out_schema,
        )

    return cand.map_batches(verify, batch_format="pandas")


def q_multipass_pairs(sf_dir: str):
    """Multi-pass blocking (Hernandez & Stolfo SIGMOD'95's central
    recommendation: several CHEAP independent blocking passes, union the
    candidate sets — each pass's false negatives are covered by the
    others): three equi-key schemes over distinct part names — first
    character (bit 1), exact length (bit 2), last character (bit 4) —
    with each candidate pair annotated by the bitmask of schemes that
    produced it (the meta-blocking evidence signal: pairs found by more
    passes are likelier matches).

    Scale shape: each scheme emits ONE (key, name) row per name (3 slim
    rows/name total, one shuffle); within-key pair emission is the capped
    phonetic-block kernel; a pair is unique WITHIN a scheme (one key per
    name per scheme), so the final ``grouped_sums`` over the pair key
    sums scheme bits into the exact bitmask and counts passes — no
    bit_or machinery needed."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        out = []
        for prefix, key, bit in (
            ("f:", nm.str[:1], 1),
            ("l:", nm.str.len().astype(str), 2),
            ("z:", nm.str[-1:], 4),
        ):
            out.append(
                pd.DataFrame(
                    {
                        "bkey": prefix + key,
                        "p_name": nm.to_numpy(object),
                        "bit": np.full(len(df), bit, dtype=np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    pair_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("bit", pa.int64())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        nm = np.sort(g["p_name"].unique().astype(object))
        bit = int(g["bit"].iloc[0]) if len(g) else 0
        if len(nm) < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                schema=pair_schema,
            )
        ia, ib = np.triu_indices(len(nm), k=1)
        return pa.Table.from_arrays(
            [
                pa.array(nm[ia], pa.string()),
                pa.array(nm[ib], pa.string()),
                pa.array(np.full(len(ia), bit, dtype=np.int64), pa.int64()),
            ],
            schema=pair_schema,
        )

    cand = (
        names.map_batches(keys, batch_format="pandas")
        .groupby("bkey")
        .map_groups(pairs, batch_format="pandas")
    )
    return grouped_sums(
        cand, ["name_a", "name_b"], sums={"schemes": "bit"}, count_as="n_schemes"
    )


def q_pair_triangles(sf_dir: str, threshold: float = 0.8):
    """Triangle enumeration over the fuzzy-match graph — the classical
    graph-strengthening signal for transitive clustering (a pair inside a
    triangle is far likelier a true match than a lone edge; used to
    confirm/deny bridges before union-find merges clusters).

    Edges are exactly ``q_fuzzy_name_pairs`` (canonical name_a < name_b,
    distinct). Distributed closure with NO driver materialization and NO
    all-pairs step:
      wedges:   edges ⋈ edges on (e1.name_b = e2.name_a) — every 2-path
                a<b<c through its middle node, a hash join keyed on the
                shared endpoint;
      closure:  wedges ⋈ edges on (name_a, name_c) — keeps the wedges
                whose long side is itself an edge. Each triangle appears
                EXACTLY once (role order fixed by a<b<c), so no distinct
                pass is needed.
    Skew note: a hot middle node of degree d yields C(d,2) wedges — the
    wedge join is the stage to salt/cap at web scale (the metablocking
    discipline); fuzzy blocks are already capped upstream."""
    return _triangles_of(q_fuzzy_name_pairs(sf_dir, threshold=threshold))


def _triangles_of(edges: "rd.Dataset") -> "rd.Dataset":
    """Triangle closure over a canonical (name_a < name_b) edge Dataset —
    shared by q_pair_triangles / q_unsupported_edges /
    q_clustering_coefficient so callers can pass one MATERIALIZED edge
    set instead of re-running the blocked JW join per consumer."""

    def as_mid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mid": df["name_a"], "name_c": df["name_b"]})

    def as_close(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"ca": df["name_a"], "cc": df["name_b"]})

    e2 = edges.map_batches(as_mid, batch_format="pandas")
    e3 = edges.map_batches(as_close, batch_format="pandas")
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    wedges = edges.join(
        e2, "inner", num_partitions=n_part, on=("name_b",), right_on=("mid",)
    )
    tri = wedges.join(
        e3,
        "inner",
        num_partitions=n_part,
        on=("name_a", "name_c"),
        right_on=("ca", "cc"),
    )
    return tri.select_columns(["name_a", "name_b", "name_c"])


def _em_from_hist(hist: pd.DataFrame, n_iter: int = 20) -> pd.DataFrame:
    """Fixed-iteration Fellegi-Sunter EM (Winkler '88 unsupervised m/u
    estimation under conditional independence) on an 8-row agreement-
    pattern histogram. Pure float64 on an integer-exact input; outputs
    quantized to the 1e-6 grid (micro-units) — EM fixed points are far
    from grid boundaries, so the quantization is stable across
    independently-written implementations."""
    fields = ["agree_name", "agree_type", "agree_size"]
    gamma = hist[fields].to_numpy(np.float64)  # [K, 3]
    n = hist["n_pairs"].to_numpy(np.float64)  # [K]
    total = n.sum()
    pi = 0.1
    m = np.array([0.9, 0.9, 0.9])
    u = np.array([0.1, 0.1, 0.1])
    for _ in range(n_iter):
        pm = np.prod(m * gamma + (1.0 - m) * (1.0 - gamma), axis=1)
        pu = np.prod(u * gamma + (1.0 - u) * (1.0 - gamma), axis=1)
        w = pi * pm / (pi * pm + (1.0 - pi) * pu)
        wm = n * w
        wu = n * (1.0 - w)
        pi = wm.sum() / total
        m = (wm[:, None] * gamma).sum(axis=0) / wm.sum()
        u = (wu[:, None] * gamma).sum(axis=0) / wu.sum()
    q = lambda x: np.rint(np.asarray(x) * 1e6).astype(np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "field": fields,
            "m_micro": q(m),
            "u_micro": q(u),
            "w_agree_micro": q(np.log(m / u)),
            "w_disagree_micro": q(np.log((1.0 - m) / (1.0 - u))),
        }
    )


def q_em_weights(sf_dir: str, n_iter: int = 20):
    """UNSUPERVISED m/u estimation: Fellegi-Sunter EM over the agreement-
    pattern histogram (vs q_match_weights, which uses gold labels). The
    distributed work is exactly the ``q_match_patterns`` histogram — the
    sufficient statistic — after which EM runs driver-side on 8 rows for
    a FIXED iteration count; per-field match/unmatch probabilities and
    log-weights come back as integer micro-units.

    Scale note: the histogram pass is the same blocked chunked-bincount
    dataflow as q_match_patterns (no pair materialization); EM itself is
    O(8 x 3 x n_iter) regardless of corpus size."""
    hist = q_match_patterns(sf_dir).to_pandas()
    full = (
        pd.MultiIndex.from_product([[0, 1]] * 3,
                                   names=["agree_name", "agree_type", "agree_size"])
        .to_frame(index=False)
    )
    hist = full.merge(hist, how="left",
                      on=["agree_name", "agree_type", "agree_size"]).fillna(0)
    hist["n_pairs"] = hist["n_pairs"].astype(np.int64)
    return _em_from_hist(hist, n_iter=n_iter)


SOFT_TFIDF_JW_MIN = 900_000  # token-closeness gate, micro-JW


def q_soft_tfidf_pairs(sf_dir: str):
    """Soft TF-IDF pair scoring (Cohen, Ravikumar & Fienberg IIWeb'03 —
    the classical hybrid that beat plain JW/Levenshtein on name matching):
    for each blocked candidate pair, every token of A is matched to its
    closest token of B by Jaro-Winkler; CLOSE matches (jw ≥ 0.9)
    contribute idf(t_A)·idf(t_B)·jw. Corpus weighting (the IDF table) is
    a GLOBAL aggregate feeding a pair scorer — the cross-family
    composition a real linkage stack runs.

    Integer contract: df counts are exact; idf quantizes to milli-nats
    (rint(ln((N+1)/(df+1))·1e3) — log of a ratio of exact ints, same
    float64 on both sides); jw quantizes to micro (the property-pinned
    kernel); each contribution is a product of three int64s (≤ ~5e13) and
    the final score an int64 sum — bit-equal however pairs are batched.
    Tie-break for the argmax token: (jw desc, token asc).

    Scale shape: the IDF table is vocabulary-bounded and broadcast once;
    candidate pairs come from the exact dual-band blocking of
    ``q_fuzzy_name_pairs``; scoring is a per-pair token kernel (tokens/
    name is O(few)) inside an actor pool that holds the IDF dict."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    # df(t) over distinct names, distributed (explode -> grouped count)
    def toks(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["p_name"].astype(str).str.split().explode().dropna()
        pairs_ = pd.DataFrame(
            {"row": ex.index.to_numpy(), "token": ex.to_numpy(object)}
        ).drop_duplicates()  # one (name, token) occurrence
        out = pairs_.groupby("token", as_index=False).size()
        out = out.rename(columns={"size": "n_df"})
        out["n_df"] = out["n_df"].astype(np.int64)
        return out

    df_counts = grouped_sums(
        names.map_batches(toks, batch_format="pandas"), ["token"], {"n_df": "n_df"}
    ).to_pandas()
    n_names = int(names.count())
    idf = {
        t: int(np.rint(np.log(np.float64(n_names + 1) / np.float64(c + 1)) * 1e3))
        for t, c in zip(df_counts["token"], df_counts["n_df"])
    }
    idf_ref = broadcast(idf)

    pairs = q_fuzzy_name_pairs(sf_dir)

    class Score:
        def __init__(self):
            self.idf = ray.get(idf_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            scores = np.zeros(len(df), dtype=np.int64)
            a_col = df["name_a"].astype(str).to_numpy(object)
            b_col = df["name_b"].astype(str).to_numpy(object)
            for i in range(len(df)):
                ta = a_col[i].split()
                tb = sorted(b_col[i].split())
                total = 0
                for t in ta:
                    best_jw = -1
                    best_s = None
                    for s in tb:
                        jwm = int(np.rint(jaro_winkler(t, s) * 1e6))
                        if jwm > best_jw:
                            best_jw, best_s = jwm, s
                    if best_s is not None and best_jw >= SOFT_TFIDF_JW_MIN:
                        total += (
                            self.idf.get(t, 0) * self.idf.get(best_s, 0) * best_jw
                        )
                scores[i] = total
            return pd.DataFrame(
                {
                    "name_a": df["name_a"].astype(str),
                    "name_b": df["name_b"].astype(str),
                    "soft_tfidf": scores,
                }
            )

    return pairs.map_batches(Score, batch_format="pandas", concurrency=(1, 4))


QGRAM_Q = 4
QGRAM_OVERLAP_MIN = 3
QGRAM_HOT_DF_CAP = 64  # inverted-list length above which a gram is skipped


def q_qgram_overlap_pairs(sf_dir: str, min_overlap: int = QGRAM_OVERLAP_MIN):
    """Q-gram set-similarity join via INVERTED LISTS (Gravano et al.
    VLDB'01 — the posting-list plan of PPJoin-family joins): name pairs
    sharing at least ``min_overlap`` distinct character 4-grams, with the
    exact shared-gram count. The co-occurrence shuffle is keyed by GRAM —
    each gram's posting list yields its within-list pairs, and a grouped
    sum folds per-gram contributions into exact overlap counts (the
    winnow_dups shared-count shape on character q-grams).

    Skew discipline: a stop-gram with df=d yields C(d,2) pairs; grams
    with df > ``QGRAM_HOT_DF_CAP`` are DROPPED with a logged count (they
    carry ~zero similarity signal — the blacklist rationale of the
    reference's frequency gates, 1st Place/src/process_data.py:425-444).
    The oracle applies the same df cap, so the contract is explicit."""
    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    n_buckets = default_buckets()

    def post(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        # vectorized positional q-grams: str.slice sweep, melt, distinct
        cols = {
            i: nm.str.slice(i, i + QGRAM_Q)
            for i in range(int(nm.str.len().max() or 0) - QGRAM_Q + 1)
        }
        if not cols:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "p_name": pd.Series([], dtype=object),
                                 "_tb": pd.Series([], dtype=np.int64)})
        wide = pd.DataFrame(cols)
        wide["p_name"] = nm
        long = wide.melt(id_vars="p_name", value_name="token")[
            ["token", "p_name"]
        ]
        long = long[long["token"].str.len() == QGRAM_Q].drop_duplicates()
        out = long.reset_index(drop=True)
        h = pd.util.hash_pandas_object(out["token"], index=False).to_numpy()
        out["_tb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def pairs_of_bucket(g: pd.DataFrame) -> pa.Table:
        # one Ray-level group per BUCKET (the VERDICT r3 #1 discipline);
        # per-token posting lists are contiguous segments after one sort
        g = g.sort_values(["token", "p_name"], kind="mergesort")
        nm = g["p_name"].to_numpy(object)
        tok = g["token"].to_numpy(object)
        n = len(g)
        a_parts: list = []
        b_parts: list = []
        dropped = 0
        start = 0
        for i in range(1, n + 1):
            if i < n and tok[i] == tok[start]:
                continue
            d = i - start
            if d > QGRAM_HOT_DF_CAP:
                dropped += 1
            elif d >= 2:
                ia, ib = np.triu_indices(d, k=1)
                a_parts.append(nm[start:i][ia])
                b_parts.append(nm[start:i][ib])
            start = i
        if dropped:
            logger.warning(
                "qgram_overlap: dropped %d hot grams (df > %d)",
                dropped, QGRAM_HOT_DF_CAP,
            )
        a = np.concatenate(a_parts) if a_parts else np.array([], dtype=object)
        b = np.concatenate(b_parts) if b_parts else np.array([], dtype=object)
        return pa.Table.from_arrays(
            [pa.array(a, pa.string()), pa.array(b, pa.string()),
             pa.array(np.ones(len(a), np.int64))],
            names=["name_a", "name_b", "n"],
        )

    contrib = (
        names.map_batches(post, batch_format="pandas")
        .groupby("_tb")
        .map_groups(pairs_of_bucket, batch_format="pandas")
    )
    sums = grouped_sums(contrib, ["name_a", "name_b"], {"n_shared": "n"})

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["n_shared"] >= min_overlap]
        return pd.DataFrame(
            {
                "name_a": d["name_a"].astype(str),
                "name_b": d["name_b"].astype(str),
                "n_shared": d["n_shared"].to_numpy(np.int64),
            }
        )

    return sums.map_batches(gate, batch_format="pandas")


def q_match_degree_hist(sf_dir: str):
    """Degree distribution of the fuzzy-match graph — the skew diagnostic
    run BEFORE transitive clustering (a heavy-tailed degree histogram is
    the signal to salt hot nodes / cap star contraction; PAPERS.md
    BTS-style balancing). Edges are ``q_fuzzy_name_pairs``; each edge
    contributes to both endpoints' degrees; output = (degree,
    n_nodes).

    Shape: explode each edge into two (node, 1) rows inside the same
    batch, fold per-node degrees with one ``grouped_sums``, then fold the
    degree histogram with a second — both exchanges carry partial rows
    only."""
    edges = q_fuzzy_name_pairs(sf_dir)

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [df["name_a"].to_numpy(object), df["name_b"].to_numpy(object)]
                ),
                "one": np.ones(2 * len(df), dtype=np.int64),
            }
        )

    deg = grouped_sums(
        edges.map_batches(ends, batch_format="pandas"), ["node"], {"degree": "one"}
    )

    def as_hist(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"degree": df["degree"].to_numpy(np.int64),
             "one": np.ones(len(df), dtype=np.int64)}
        )

    return grouped_sums(
        deg.map_batches(as_hist, batch_format="pandas"), ["degree"], {"n_nodes": "one"}
    )


TRANSITIVE_CLUSTER_CAP = 4096


def q_transitive_pairs(sf_dir: str):
    """The CLERICAL-REVIEW QUEUE of transitive clustering: pairs implied
    by connectivity (same connected component of the match graph) that
    are NOT themselves match edges. Union-find asserts these
    transitively; a production linkage routes exactly this set to
    review/re-scoring before merging golden records — the
    confirm-the-bridges discipline of q_pair_triangles, inverted.

    Shape: components + in-cluster pair generation + pair anti-join:
    cluster labels from ``q_name_clusters`` (vocabulary-bounded), members
    hash-bucketed BY CLUSTER REP so each cluster's members co-locate
    (clusters over ``TRANSITIVE_CLUSTER_CAP`` members truncate with a
    logged drop — the _cap_block discipline), vectorized triu pairs per
    cluster segment, then an anti-join against the edge set on the
    canonical pair key (``semi_anti_filter``: broadcast under the key
    threshold, hash join above)."""
    from .common import semi_anti_filter

    clusters = q_name_clusters(sf_dir)
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        h = pd.util.hash_pandas_object(out["cluster_rep"], index=False).to_numpy()
        out["_cb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def pairs_of(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cluster_rep", "p_name"], kind="mergesort")
        rep = g["cluster_rep"].to_numpy(object)
        nm = g["p_name"].to_numpy(object)
        n = len(g)
        a_parts: list = []
        b_parts: list = []
        dropped = 0
        start = 0
        for i in range(1, n + 1):
            if i < n and rep[i] == rep[start]:
                continue
            d = i - start
            if d > TRANSITIVE_CLUSTER_CAP:
                dropped += 1
            elif d >= 2:
                ia, ib = np.triu_indices(d, k=1)
                a_parts.append(nm[start:i][ia])
                b_parts.append(nm[start:i][ib])
            start = i
        if dropped:
            logger.warning(
                "transitive_pairs: dropped %d clusters over %d members",
                dropped, TRANSITIVE_CLUSTER_CAP,
            )
        a = np.concatenate(a_parts) if a_parts else np.array([], dtype=object)
        b = np.concatenate(b_parts) if b_parts else np.array([], dtype=object)
        return pa.Table.from_arrays(
            [pa.array(a, pa.string()), pa.array(b, pa.string())],
            names=["name_a", "name_b"],
        )

    cand = (
        clusters.map_batches(tag, batch_format="pandas")
        .groupby("_cb")
        .map_groups(pairs_of, batch_format="pandas")
    )

    def pk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_pk"] = out["name_a"].astype(str) + "\x00" + out["name_b"].astype(str)
        return out

    edges_pk = q_fuzzy_name_pairs(sf_dir).map_batches(pk, batch_format="pandas")
    out = semi_anti_filter(
        cand.map_batches(pk, batch_format="pandas"), "_pk", edges_pk, "_pk",
        anti=True,
    )
    return out.select_columns(["name_a", "name_b"])


PAGERANK_SCALE = 10**12
PAGERANK_ITERS = 10


def q_match_pagerank(sf_dir: str, n_iter: int = PAGERANK_ITERS):
    """Fixed-iteration PageRank over the undirected fuzzy-match graph —
    the node-centrality signal that ranks ambiguous hub records (a
    high-rank name participates in many match chains and deserves
    clerical priority; the degree histogram's weighted refinement).

    INTEGER power iteration (the k-means/PQ broadcast-iterate contract):
    ranks live on a 10^12 grid; each step is
    r'[v] = (15·S)//(100·n) + (85·Σ_u r[u]//deg[u])//100 — floor
    divisions on exact int64, so the fixed point is bit-identical at any
    batch layout and accumulation order. Each of the ``n_iter`` passes
    streams the edge Dataset once: per-batch partial contribution sums
    per node (bounded by nodes-per-batch rows), a driver fold bounded by
    the name vocabulary, and a re-broadcast of the rank vector.
    Ids/name-attach via the distributed ``_ranked_name_ids`` machinery
    (VERDICT r4 #3)."""
    ids, n = _ranked_name_ids(sf_dir)
    if n > FUZZY_GRAPH_NODE_MAX:
        raise ValueError(
            f"q_match_pagerank: {n} distinct names exceeds "
            f"FUZZY_GRAPH_NODE_MAX ({FUZZY_GRAPH_NODE_MAX}); the rank "
            "vector is O(n) driver state by design"
        )
    pairs = q_fuzzy_name_pairs(sf_dir)

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        a = df["u"].to_numpy(np.int64)
        b = df["v"].to_numpy(np.int64)
        return pd.DataFrame(
            {"u": np.concatenate([a, b]), "v": np.concatenate([b, a])}
        )

    edges = (
        _edges_from_pairs(pairs, ids, n)
        .map_batches(symmetrize, batch_format="pandas")
        .materialize()
    )
    names = _ids_name_arr(ids, n)

    deg = np.zeros(n, dtype=np.int64)
    for b in edges.iter_batches(batch_format="pandas"):
        np.add.at(deg, b["u"].to_numpy(np.int64), 1)

    base = (15 * PAGERANK_SCALE) // (100 * n)
    r = np.full(n, PAGERANK_SCALE // n, dtype=np.int64)
    deg_ref = broadcast(deg)
    for _ in range(n_iter):
        r_ref = broadcast(r)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            r_, d_ = ray.get(r_ref), ray.get(deg_ref)
            u = df["u"].to_numpy(np.int64)
            v = df["v"].to_numpy(np.int64)
            c = r_[u] // np.maximum(d_[u], 1)
            out = pd.DataFrame({"v": v, "c": c})
            return out.groupby("v", as_index=False)["c"].sum()

        p = edges.map_batches(contrib, batch_format="pandas").to_pandas()
        sums = np.zeros(n, dtype=np.int64)
        if len(p):
            np.add.at(sums, p["v"].to_numpy(np.int64), p["c"].to_numpy(np.int64))
        r = base + (85 * sums) // 100

    return rd.from_pandas(
        pd.DataFrame({"p_name": names, "pagerank_pico": r.astype(np.int64)})
    )


# --- active-learning pair selection (clerical-review queue) -------------------

UNCERTAIN_K = 50
UNCERTAIN_THETA_BIN = 17  # floor(MATCH_JW_THRESHOLD * ROC_BINS)


def q_uncertain_pairs(
    sf_dir: str,
    k: int = UNCERTAIN_K,
    bins: int = ROC_BINS,
    theta_bin: int = UNCERTAIN_THETA_BIN,
    band: int | None = None,
):
    """Uncertainty sampling for clerical review (the active-learning loop
    of probabilistic linkage, Sarawagi & Bhamidipaty KDD'02): the k blocked
    part pairs whose quantized name similarity sits CLOSEST to the decision
    threshold — uncertainty = |floor(jw*bins) - theta_bin| — are exactly
    the pairs a human labeler resolves first, because they carry the most
    information for re-estimating m/u.

    Scale shape: the `q_match_roc` machinery (broadcast quantized JW
    vocabulary matrix, chunked rectangular outer comparisons per
    (first-char, brand) block) emitting top-k PARTIALS — each block keeps
    only its k least-certain pairs (lexsort on (uncertainty, a, b)), so
    the final driver merge sees <= k rows per block, never the pair
    stream. ``band`` (default: no filter) additionally drops pairs with
    uncertainty > band at the source — the production knob when k-per-
    block is still too much output. Exact top-k: blocks partition the
    pair space, and per-group top-k is a monoid under it."""
    names = sorted(
        distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
        .to_pandas()["p_name"]
        .astype(str)
        .tolist()
    )
    idx, mat = ray.get(_jw_bin_matrix.remote(names, bins))
    idx_ref, mat_ref = broadcast(idx), broadcast(mat)

    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "ch": pd.Series([], dtype=str),
                    "brand": pd.Series([], dtype=str),
                    "pk": pd.Series([], dtype=np.int64),
                    "nid": pd.Series([], dtype=np.int64),
                }
            )
        lookup = ray.get(idx_ref)
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "brand": df["p_brand"].astype(str),
                "pk": df["p_partkey"].to_numpy(np.int64),
                "nid": nm.map(lookup).to_numpy(np.int64),
            }
        )

    out_schema = pa.schema(
        [
            ("p_partkey_a", pa.int64()),
            ("p_partkey_b", pa.int64()),
            ("jw_bin", pa.int64()),
            ("uncertainty", pa.int64()),
        ]
    )

    def block_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("pk", kind="mergesort")
        pk = g["pk"].to_numpy(np.int64)
        nid = g["nid"].to_numpy(np.int64)
        binmat = ray.get(mat_ref)
        n = len(g)
        pa_out, pb_out, sb_out = [], [], []
        for i0 in range(0, max(n - 1, 0), _PAIR_CHUNK):
            i1 = min(i0 + _PAIR_CHUNK, n - 1)
            ii = np.arange(i0, i1)
            jj = np.arange(i0 + 1, n)
            tri = jj[None, :] > ii[:, None]
            sb = binmat[nid[ii][:, None], nid[jj][None, :]].astype(np.int64)
            ia, jb = np.nonzero(tri)
            pa_out.append(pk[ii][ia])
            pb_out.append(pk[jj][jb])
            sb_out.append(sb[tri])
        if pa_out:
            pka = np.concatenate(pa_out)
            pkb = np.concatenate(pb_out)
            sb = np.concatenate(sb_out)
        else:
            pka = pkb = sb = np.empty(0, dtype=np.int64)
        unc = np.abs(sb - theta_bin)
        if band is not None:
            m = unc <= band
            pka, pkb, sb, unc = pka[m], pkb[m], sb[m], unc[m]
        order = np.lexsort((pkb, pka, unc))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(pka[order], pa.int64()),
                pa.array(pkb[order], pa.int64()),
                pa.array(sb[order], pa.int64()),
                pa.array(unc[order], pa.int64()),
            ],
            schema=out_schema,
        )

    partials = (
        ds.map_batches(slim, batch_format="pandas")
        .groupby(["ch", "brand"])
        .map_groups(block_topk, batch_format="pandas")
    )
    # <= k rows per block survive; the global merge is driver-bounded
    out = partials.to_pandas()
    out = out.sort_values(
        ["uncertainty", "p_partkey_a", "p_partkey_b"], kind="mergesort"
    ).head(k)
    return rd.from_pandas(out.reset_index(drop=True))


# --- clean-clean two-source linkage ------------------------------------------

CROSSLINK_JW_THRESHOLD = 0.8


def q_crosslink_best(
    sf_dir: str,
    threshold: float = CROSSLINK_JW_THRESHOLD,
    max_len_diff: int = 3,
    len_band: int = 4,
):
    """Clean-clean record linkage between TWO sources with a per-record
    match decision: source A = part names on even part keys, source B =
    names on odd keys (the standard benchmark construction — one catalog
    split into two deduplicated sources, cf. DBLP-ACM / Abt-Buy), blocked
    by the fuzzy dual-band discipline, and each A-record linked to its
    single best B-candidate (JW argmax, ties -> lexicographically smallest
    partner) when that best clears ``threshold``. This is the directional
    linkage DECISION the self-join family doesn't exercise: every query
    record gets at most one verdict, the shape of a lookup-against-master
    deployment (match incoming records to a reference catalog).

    Emits the quantized score (``jw_ubin = floor(jw * 1e6)``, the
    JW_UBIN_SCALE discipline) — the JW kernel is property-pinned bit-equal
    to DuckDB's jaro_winkler_similarity, so the floor is stable across the
    oracle boundary.

    Scale shape: two slim exchanges, neither carrying records — (1) the
    dual-band block shuffle over (char, band, name, src) distinct rows
    (each source deduplicated map-side); per block only CROSS-source,
    length-compatible pairs are scored, directed A->B; (2) an A-name-keyed
    hash-bucket argmax (vectorized sort + drop_duplicates over the whole
    bucket frame — dual-band duplicate candidacies collapse here, both
    copies carrying the same jw)."""
    cand = _crosslink_candidates(sf_dir, threshold, max_len_diff, len_band)
    return _per_a_argmax(cand)


def _crosslink_candidates(
    sf_dir: str,
    threshold: float,
    max_len_diff: int,
    len_band: int,
) -> rd.Dataset:
    """Directed A->B candidate stream (name_a, cand, jw_ubin) for the
    two-source crosslink setting (even/odd part-key split, dual-band
    blocking, threshold-filtered). Dual-band duplicate candidacies are
    NOT yet deduped — consumers collapse them in their own keyed bucket
    pass (both copies carry the same jw)."""
    if len_band <= max_len_diff:
        raise ValueError("len_band must exceed max_len_diff for exact blocking")
    parts = read(sf_dir, "part", ["p_partkey", "p_name"])

    def src_names(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "p_name": df["p_name"].astype(str),
                "src": (df["p_partkey"].to_numpy(np.int64) % 2).astype(np.int64),
            }
        )
        return out.drop_duplicates()

    names = _distinct_src_names(parts.map_batches(src_names, batch_format="pandas"))

    def keys(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        out = pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
                "src": np.concatenate([df["src"].to_numpy(np.int64)] * 2),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    directed_schema = pa.schema(
        [("name_a", pa.string()), ("cand", pa.string()), ("jw_ubin", pa.int64())]
    )

    def directed(g: pd.DataFrame) -> pa.Table:
        a = g[g["src"] == 0]
        b = g[g["src"] == 1]
        na = a["p_name"].to_numpy(object)
        nb = b["p_name"].to_numpy(object)
        la = a["ln"].to_numpy(np.int64)
        lb = b["ln"].to_numpy(np.int64)
        a_out = np.array([], dtype=object)
        b_out = np.array([], dtype=object)
        s_out = np.array([], dtype=np.int64)
        if len(na) and len(nb):
            ia, ib = np.nonzero(
                np.abs(la[:, None] - lb[None, :]) <= max_len_diff
            )
            if len(ia):
                # one vectorized DuckDB JW pass over the length-filter
                # survivors (VERDICT r4 #4; property-pinned identical)
                jw = batch_jw(na[ia], nb[ib])
                hit = jw >= threshold
                a_out, b_out = na[ia[hit]], nb[ib[hit]]
                s_out = np.floor(jw[hit] * JW_UBIN_SCALE).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(a_out, pa.string()),
                pa.array(b_out, pa.string()),
                pa.array(s_out, pa.int64()),
            ],
            schema=directed_schema,
        )

    cand = (
        names.map_batches(keys, batch_format="pandas")
        .groupby(["ch", "band"])
        .map_groups(directed, batch_format="pandas")
    )
    return cand


def _per_a_argmax(cand: rd.Dataset, n_buckets: int | None = None) -> rd.Dataset:
    """Per-A-record argmax over the directed candidate stream: A-name-keyed
    hash-bucket, vectorized sort + drop_duplicates over the whole bucket
    frame (dual-band duplicate candidacies collapse here)."""
    if n_buckets is None:
        n_buckets = default_buckets()

    def name_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(subset=["name_a", "cand"])
        h = pd.util.hash_pandas_object(d["name_a"], index=False).to_numpy()
        d = d.copy()
        d["_nb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(d, preserve_index=False)

    best_schema = pa.schema(
        [("name_a", pa.string()), ("best_b", pa.string()), ("jw_ubin", pa.int64())]
    )

    def bucket_best(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=["name_a", "cand"])
        g = g.sort_values(
            ["name_a", "jw_ubin", "cand"], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(subset=["name_a"], keep="first")
        return pa.Table.from_arrays(
            [
                pa.array(g["name_a"].to_numpy(object), pa.string()),
                pa.array(g["cand"].to_numpy(object), pa.string()),
                pa.array(g["jw_ubin"].to_numpy(np.int64), pa.int64()),
            ],
            schema=best_schema,
        )

    return (
        cand.map_batches(name_bucket, batch_format="pandas")
        .groupby("_nb")
        .map_groups(bucket_best, batch_format="pandas")
    )


def _distinct_src_names(cand: rd.Dataset, n_buckets: int | None = None) -> rd.Dataset:
    """Distinct (p_name, src) rows — the _distinct_name_pairs shape on the
    tagged-source key (map-side combine, then hash-bucketed vectorized
    drop_duplicates)."""
    if n_buckets is None:
        n_buckets = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = df.drop_duplicates()
        h = pd.util.hash_pandas_object(
            out["p_name"].astype(str), index=False
        ).to_numpy()
        out = out.copy()
        out["_db"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_dedup(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(subset=["p_name", "src"]).drop(columns=["_db"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        cand.map_batches(add_bucket, batch_format="pandas")
        .groupby("_db")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


GREEDY_MAX_ROUNDS = 256


def q_greedy_assignment(
    sf_dir: str,
    threshold: float = CROSSLINK_JW_THRESHOLD,
    max_len_diff: int = 3,
    len_band: int = 4,
    max_rounds: int = GREEDY_MAX_ROUNDS,
):
    """GLOBAL greedy one-to-one assignment over the two-source candidate
    graph — the matching the sequential algorithm produces by walking all
    pairs in descending score order and taking a pair iff both endpoints
    are still free (the classic linkage assignment step after scoring,
    cf. Fellegi-Sunter one-to-one restriction).

    Distributed as ITERATED LOCALLY-DOMINANT MATCHING (Preis '99; Manne &
    Bisseling '07): each round matches every pair that is simultaneously
    its A-endpoint's and its B-endpoint's best remaining candidate under
    the strict total pair order (jw_ubin DESC, name_a ASC, name_b ASC),
    then removes matched endpoints. Under a strict total order the union
    of rounds EQUALS the sequential greedy matching — the oracle runs the
    textbook sequential walk and the driver gate pins the equivalence.

    Scale shape: rounds operate on the THRESHOLD-FILTERED candidate set
    (a small fraction of the corpus — the same boundedness the verified
    LSH pair stream has), never on records. Each round is two keyed
    argmax bucket passes + one pair-keyed mutuality bucket; matched
    endpoints broadcast (bounded by matches so far; the semi_anti_filter
    dual plan is the documented swap at larger match volumes). A
    nonempty candidate set always contains its global-max pair, which is
    locally dominant — so every round matches >= 1 pair and termination
    is certain; ``max_rounds`` only guards a logic regression (loud
    RuntimeError, the propagate discipline)."""
    cand = _crosslink_candidates(sf_dir, threshold, max_len_diff, len_band)
    n_buckets = default_buckets()

    pair_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("jw_ubin", pa.int64())]
    )

    def pair_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(subset=["name_a", "cand"])
        h = pd.util.hash_pandas_object(
            d["name_a"] + "\x00" + d["cand"], index=False
        ).to_numpy()
        d = d.copy()
        d["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(d, preserve_index=False)

    def bucket_dedup(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=["name_a", "cand"])
        return pa.Table.from_arrays(
            [
                pa.array(g["name_a"].to_numpy(object), pa.string()),
                pa.array(g["cand"].to_numpy(object), pa.string()),
                pa.array(g["jw_ubin"].to_numpy(np.int64), pa.int64()),
            ],
            schema=pair_schema,
        )

    remaining = (
        cand.map_batches(pair_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_dedup, batch_format="pandas")
        .materialize()
    )

    # SHUFFLE-FREE rounds (r5: the three per-round groupby sort exchanges
    # belonged to the iterated-shuffle stall class that wedged
    # q_stable_matching). The per-endpoint argmax under the strict total
    # order is a monoid, so each side folds through per-batch partials +
    # ``tree_to_pandas``; the fold results are node-bounded — the same
    # bound the old plan already paid by collecting `mutual` each round —
    # and the mutuality test is one driver merge of those two frames.
    def best_fold(key: str, partner: str):
        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or key not in df.columns:
                return pd.DataFrame(
                    {"name_a": pd.Series([], dtype=object),
                     "name_b": pd.Series([], dtype=object),
                     "jw_ubin": pd.Series([], dtype=np.int64)})
            return df.sort_values(
                [key, "jw_ubin", partner], ascending=[True, False, True],
                kind="mergesort",
            ).drop_duplicates(subset=[key], keep="first")

        return fold

    fold_a = best_fold("name_a", "name_b")
    fold_b = best_fold("name_b", "name_a")

    def arrow_partial(fold):
        # map-side partial emits Arrow with a pinned schema: an empty
        # pandas string block trips Ray's sampling size estimator (the
        # distinct_column note in common.py)
        def fn(df: pd.DataFrame) -> pa.Table:
            out = fold(df)
            return pa.Table.from_arrays(
                [pa.array(out["name_a"].to_numpy(object), pa.string()),
                 pa.array(out["name_b"].to_numpy(object), pa.string()),
                 pa.array(out["jw_ubin"].to_numpy(np.int64))],
                schema=pair_schema,
            )

        return fn

    matched_frames: list[pd.DataFrame] = []
    for _round in range(max_rounds + 1):
        if remaining.count() == 0:
            break
        if _round == max_rounds:
            raise RuntimeError(
                f"greedy assignment did not drain in {max_rounds} rounds "
                "(every round must match >= 1 pair — logic regression)"
            )
        best_a = fold_a(tree_to_pandas(
            remaining.map_batches(arrow_partial(fold_a),
                                  batch_format="pandas"), fold_a
        ))
        best_b = fold_b(tree_to_pandas(
            remaining.map_batches(arrow_partial(fold_b),
                                  batch_format="pandas"), fold_b
        ))
        # mutual = pairs that are BOTH endpoints' best (locally dominant)
        mutual = best_a.merge(
            best_b[["name_a", "name_b"]], on=["name_a", "name_b"],
            how="inner",
        )[["name_a", "name_b", "jw_ubin"]]
        # a nonempty remaining set always yields >= 1 mutual pair (its
        # global-max pair is locally dominant)
        matched_frames.append(mutual)
        ma_ref = broadcast(set(mutual["name_a"]))
        mb_ref = broadcast(set(mutual["name_b"]))

        def drop_matched(df: pd.DataFrame) -> pa.Table:
            if len(df):
                ma, mb = ray.get(ma_ref), ray.get(mb_ref)
                keep = ~df["name_a"].isin(ma) & ~df["name_b"].isin(mb)
                df = df[keep]
            # Arrow output with pinned schema (empty-string-block trap)
            return pa.Table.from_arrays(
                [pa.array(df["name_a"].to_numpy(object), pa.string()),
                 pa.array(df["name_b"].to_numpy(object), pa.string()),
                 pa.array(df["jw_ubin"].to_numpy(np.int64))],
                schema=pair_schema,
            )

        remaining = remaining.map_batches(
            drop_matched, batch_format="pandas"
        ).materialize()

    if matched_frames:
        out = pd.concat(matched_frames, ignore_index=True)
    else:
        out = pd.DataFrame(
            {
                "name_a": pd.Series([], dtype=object),
                "name_b": pd.Series([], dtype=object),
                "jw_ubin": pd.Series([], dtype=np.int64),
            }
        )
    out = out.sort_values(["name_a"]).reset_index(drop=True)
    return rd.from_pandas(out)


KCORE_K = 2
KCORE_MAX_ROUNDS = 128


def q_kcore(sf_dir: str, k: int = KCORE_K, max_rounds: int = KCORE_MAX_ROUNDS):
    """K-CORE of the fuzzy-name match graph: the maximal subgraph in which
    every name keeps >= k match partners — the classic density filter that
    separates genuinely ambiguous name neighborhoods (chains and hubs the
    pairwise threshold lets through) from incidental one-off matches
    before clustering; Batagelj-Zaversnik peeling, distributed.

    Output: (p_name, degree) for every name in the k-core, degree counted
    WITHIN the core (>= k by definition).

    Scale shape: iterated peeling over the EDGE set only (the verified
    match edges — the same boundedness every clustering op here relies
    on): each round one SHUFFLE-FREE degree fold (per-batch partial
    degree counts tree-combined via ``tree_to_pandas`` — r5: the
    per-round grouped_sums exchange belonged to the iterated-shuffle
    stall class that wedged q_stable_matching; the degree table is
    node-bounded, the same bound the old ``to_pandas`` already paid)
    + one broadcast-set filter dropping edges incident to sub-k names;
    a fixpoint is reached when no name falls below k (at most |nodes|
    rounds; ``max_rounds`` guards a logic regression loudly, the
    propagate discipline). The dropped-name set per round is bounded by
    the nodes leaving the core — the documented broadcast; the
    semi_anti_filter dual plan is the swap at larger volumes."""
    edges = q_fuzzy_name_pairs(sf_dir).materialize()

    def deg_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "p_name" not in df.columns:
            return pd.DataFrame(
                {"p_name": pd.Series([], dtype=object),
                 "degree": pd.Series([], dtype=np.int64)})
        return df.groupby("p_name", as_index=False).agg(
            degree=("degree", "sum"))

    deg_schema = pa.schema([("p_name", pa.string()), ("degree", pa.int64())])

    def degrees(e: rd.Dataset) -> pd.DataFrame:
        def partial(df: pd.DataFrame) -> pa.Table:
            s = pd.concat([df["name_a"], df["name_b"]], ignore_index=True)
            out = s.value_counts().rename_axis("p_name").reset_index(
                name="degree")
            # Arrow output with pinned schema (empty-string-block trap)
            return pa.Table.from_arrays(
                [pa.array(out["p_name"].astype(str).to_numpy(object),
                          pa.string()),
                 pa.array(out["degree"].to_numpy(np.int64))],
                schema=deg_schema,
            )

        d = tree_to_pandas(
            e.map_batches(partial, batch_format="pandas"), deg_fold
        )
        return deg_fold(d)  # bounded by names-with-a-match-edge

    for _round in range(max_rounds + 1):
        deg = degrees(edges)
        if len(deg) == 0:
            break
        drop = set(deg.loc[deg["degree"] < k, "p_name"].astype(str))
        if not drop:
            break
        if _round == max_rounds:
            raise RuntimeError(
                f"k-core peeling did not converge in {max_rounds} rounds"
            )
        drop_ref = broadcast(drop)

        def drop_edges(df: pd.DataFrame) -> pa.Table:
            if len(df):
                d = ray.get(drop_ref)
                keep = ~df["name_a"].isin(d) & ~df["name_b"].isin(d)
                df = df[keep]
            # Arrow output with pinned schema (empty-string-block trap)
            return pa.Table.from_arrays(
                [pa.array(df["name_a"].to_numpy(object), pa.string()),
                 pa.array(df["name_b"].to_numpy(object), pa.string())],
                schema=pa.schema([("name_a", pa.string()),
                                  ("name_b", pa.string())]),
            )

        edges = edges.map_batches(drop_edges, batch_format="pandas").materialize()

    deg = degrees(edges)
    if len(deg) == 0:
        deg = pd.DataFrame(
            {
                "p_name": pd.Series([], dtype=object),
                "degree": pd.Series([], dtype=np.int64),
            }
        )
    deg = deg.sort_values("p_name").reset_index(drop=True)
    return rd.from_pandas(deg)


PPRL_DICE_MICRO = 700_000
PPRL_BANDS = 4  # 4 x 16-bit bands over the 64-bit encoding


def q_pprl_pairs(
    sf_dir: str,
    threshold_micro: int = PPRL_DICE_MICRO,
    block_cap: int = FUZZY_BLOCK_CAP,
):
    """Privacy-preserving record linkage (Schnell/Bachteler/Reiher 2009):
    names are compared ONLY through their Bloom-filter encodings — the
    64-bit bigram encoding ``bloom_encode64`` (shared pinned kernel) —
    and linked when the Dice coefficient of the encodings clears the
    threshold (integer micro-units: ``2e6 * |A&B| // (|A|+|B|)``, exact
    arithmetic end to end). The plaintext never participates in blocking
    or scoring — the PPRL deployment constraint.

    Blocking: the encoding is cut into four 16-bit bands; a pair is a
    candidate iff it agrees on at least one NONZERO band (an all-zero
    band carries no bigram evidence, and a hot zero-band would absorb
    the whole corpus — the documented skip; the oracle replicates the
    exact same predicate, so the blocked join IS the operator semantics,
    the fuzzy_name_pairs framing). This is the standard LSH-style PPRL
    blocking recall trade — agreement on a full 16-bit slice implies
    high bit overlap, but pairs above the Dice threshold that share no
    complete band are not recalled.

    Scale shape: the shuffle carries (band, value, code) — 18-byte rows,
    never names or records; in-block verification is vectorized popcount
    over int64 codes; blocks over ``block_cap`` truncate deterministically
    with a logged drop (`_cap_block`); band-duplicate candidates collapse
    in the canonical pair-key bucket (dice identical on every copy)."""
    from ..functions.hashing import bloom_encode64

    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")

    enc_schema = pa.schema(
        [("band", pa.int64()), ("val", pa.int64()),
         ("p_name", pa.string()), ("code", pa.int64())]
    )

    def encode(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str).to_numpy(object)
        codes = np.array(
            [bloom_encode64(n) for n in nm], dtype=np.uint64
        )  # vocabulary-bounded batch; kernel is the pinned contract
        b_out, v_out, n_out, c_out = [], [], [], []
        for b in range(PPRL_BANDS):
            vals = (codes >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            keep = vals != 0  # the documented zero-band skip
            b_out.append(np.full(int(keep.sum()), b, dtype=np.int64))
            v_out.append(vals[keep].astype(np.int64))
            n_out.append(nm[keep])
            c_out.append(codes[keep].astype(np.int64))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(b_out)),
                pa.array(np.concatenate(v_out)),
                pa.array(np.concatenate(n_out), pa.string()),
                pa.array(np.concatenate(c_out)),
            ],
            schema=enc_schema,
        )

    pair_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()),
         ("dice_micro", pa.int64())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=["p_name"])
        g = _cap_block(g, "p_name", "pprl_band", block_cap)
        nm = g["p_name"].to_numpy(object)
        code = g["code"].to_numpy(np.int64).view(np.uint64)
        n = len(g)
        if n < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                schema=pair_schema,
            )
        ia, ib = np.triu_indices(n, k=1)
        inter = _popcount64(code[ia] & code[ib])
        tot = _popcount64(code[ia]) + _popcount64(code[ib])
        dice = (np.int64(2_000_000) * inter) // tot
        keep = dice >= threshold_micro
        a, b = nm[ia[keep]], nm[ib[keep]]
        lo = np.where(a <= b, a, b)
        hi = np.where(a <= b, b, a)
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.string()),
                pa.array(hi, pa.string()),
                pa.array(dice[keep].astype(np.int64)),
            ],
            schema=pair_schema,
        )

    cand = (
        names.map_batches(encode, batch_format="pandas")
        .groupby(["band", "val"])
        .map_groups(pairs, batch_format="pandas")
    )

    # canonical pair dedup (dice identical on every band copy)
    n_buckets = default_buckets()

    def pair_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(subset=["name_a", "name_b"])
        h = pd.util.hash_pandas_object(
            d["name_a"] + "\x00" + d["name_b"], index=False
        ).to_numpy()
        d = d.copy()
        d["_pb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(d, preserve_index=False)

    def bucket_dedup(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=["name_a", "name_b"])
        return pa.Table.from_arrays(
            [
                pa.array(g["name_a"].to_numpy(object), pa.string()),
                pa.array(g["name_b"].to_numpy(object), pa.string()),
                pa.array(g["dice_micro"].to_numpy(np.int64)),
            ],
            schema=pair_schema,
        )

    return (
        cand.map_batches(pair_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


GS_MAX_ROUNDS = 512


def q_stable_matching(
    sf_dir: str,
    threshold: float = CROSSLINK_JW_THRESHOLD,
    max_len_diff: int = 3,
    len_band: int = 4,
    max_rounds: int = GS_MAX_ROUNDS,
):
    """A-OPTIMAL STABLE MATCHING over the two-source candidate graph —
    Gale-Shapley deferred acceptance (1962), the third classic linkage
    assignment discipline next to mutual-best and global-greedy: no
    matched A,B pair exists where both would prefer each other over their
    assigned partners. Preferences on both sides are the strict total
    order (jw_ubin DESC, partner-name ASC) over the threshold-filtered
    candidates; with strict preferences the A-proposing outcome is UNIQUE
    regardless of proposal order, so the batched distributed rounds here
    and the oracle's textbook sequential walk must agree exactly.

    SHUFFLE-FREE rounds (r5: the original per-round groupby exchanges
    reproduced the pull-based-shuffle scheduler stall class VERDICT r4
    #1 documents — tens of sort exchanges in one session hung
    ``fetch_until_complete`` on a fresh 4-CPU session; the cc_pivot
    round discipline replaces them): the ranked preference table is the
    only corpus-scale structure and stays distributed; each round is ONE
    broadcast of the free-pointer map, ONE map_batches pass over prefs
    emitting the proposal rows (rank == pointer), and per-batch per-B
    argmax partials folded via ``tree_to_pandas`` — no shuffle anywhere
    in the loop. The engagement/free state is bounded by the
    threshold-filtered candidate set (the old plan already collected
    exactly this set to the driver every round as the winner filter;
    the same documented bound as greedy_assignment, with a loud guard).

    Each round every free A either engages, advances, or exhausts, so
    total work is bounded by the sum of candidate-list lengths;
    ``max_rounds`` guards a logic regression loudly."""
    cand = _crosslink_candidates(sf_dir, threshold, max_len_diff, len_band)
    n_buckets = default_buckets()

    # ---- ranked preference lists per A (computed once, distributed) ------
    pref_schema = pa.schema(
        [("name_a", pa.string()), ("rank", pa.int64()),
         ("name_b", pa.string()), ("jw_ubin", pa.int64())]
    )

    def a_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(subset=["name_a", "cand"])
        h = pd.util.hash_pandas_object(d["name_a"], index=False).to_numpy()
        d = d.copy()
        d["_ab"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(d, preserve_index=False)

    def rank_prefs(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(subset=["name_a", "cand"])
        g = g.sort_values(
            ["name_a", "jw_ubin", "cand"], ascending=[True, False, True],
            kind="mergesort",
        )
        rank = g.groupby("name_a").cumcount().to_numpy(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(g["name_a"].to_numpy(object), pa.string()),
                pa.array(rank),
                pa.array(g["cand"].to_numpy(object), pa.string()),
                pa.array(g["jw_ubin"].to_numpy(np.int64)),
            ],
            schema=pref_schema,
        )

    prefs = (
        cand.map_batches(a_bucket, batch_format="pandas")
        .groupby("_ab")
        .map_groups(rank_prefs, batch_format="pandas")
        .materialize()
    )

    # per-A candidate-list lengths + the starting free pool — ONE bounded
    # driver fold (≤ one row per A with candidates; the documented
    # candidate-set bound)
    lens = tree_to_pandas(
        grouped_sums(
            prefs.map_batches(
                lambda df: pd.DataFrame({"name_a": df["name_a"].astype(str)}),
                batch_format="pandas",
            ),
            ["name_a"], sums={}, count_as="n",
        ),
        lambda df: df.groupby("name_a", as_index=False).agg(n=("n", "sum")),
    )
    len_of = dict(zip(lens.get("name_a", []), lens.get("n", [])))
    free: dict = {a: 0 for a in len_of}  # name_a -> next rank to propose at
    engaged: dict = {}  # name_b -> (jw_ubin, name_a, ptr)

    prop_schema = pa.schema(
        [("name_b", pa.string()), ("name_a", pa.string()),
         ("jw_ubin", pa.int64()), ("ptr", pa.int64())]
    )

    def propose_partial(free_ref):
        def fn(df: pd.DataFrame) -> pa.Table:
            fr = ray.get(free_ref)
            a = df["name_a"].astype(str)
            ptr = a.map(fr)
            hit = ptr.notna() & (df["rank"].to_numpy(np.int64) == ptr.fillna(-1).to_numpy(np.int64))
            m = df[hit.to_numpy()]
            # batch-local per-B argmax partial (jw DESC, name_a ASC)
            m = m.sort_values(["name_b", "jw_ubin", "name_a"],
                              ascending=[True, False, True], kind="mergesort")
            m = m.drop_duplicates(subset=["name_b"], keep="first")
            return pa.Table.from_arrays(
                [
                    pa.array(m["name_b"].to_numpy(object), pa.string()),
                    pa.array(m["name_a"].to_numpy(object), pa.string()),
                    pa.array(m["jw_ubin"].to_numpy(np.int64)),
                    pa.array(m["rank"].to_numpy(np.int64)),
                ],
                schema=prop_schema,
            )
        return fn

    def prop_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "name_b" not in df.columns:
            return pd.DataFrame(
                {"name_b": pd.Series([], dtype=object),
                 "name_a": pd.Series([], dtype=object),
                 "jw_ubin": pd.Series([], dtype=np.int64),
                 "ptr": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["name_b", "jw_ubin", "name_a"],
                            ascending=[True, False, True], kind="mergesort")
        return df.drop_duplicates(subset=["name_b"], keep="first")

    for _round in range(max_rounds + 1):
        if not free:
            break
        if _round == max_rounds:
            raise RuntimeError(
                f"deferred acceptance did not drain in {max_rounds} rounds"
            )
        free_ref = broadcast(dict(free))
        # this round's best proposer per B: per-batch partial + tree fold.
        # NOTE the fold keeps only the best PROPOSAL per B, which suffices:
        # every free A at pointer p proposes exactly once this round, and
        # only the per-B best can displace an incumbent.
        props = tree_to_pandas(
            prefs.map_batches(propose_partial(free_ref),
                              batch_format="pandas"),
            prop_fold,
        )
        props = prop_fold(props)

        # driver transition (bounded by the candidate set): losers —
        # rejected proposers and displaced incumbents — re-enter free with
        # pointer+1; As whose pointer ran past their list end exhaust.
        # round_free = the As that actually proposed THIS round (ranks are
        # dense 0..len-1, so a free A proposed iff its pointer is in
        # range); incumbents displaced mid-round re-enter free but must
        # NOT advance again until they propose next round.
        round_free = {a for a in free if free[a] < len_of.get(a, 0)}
        for a in list(free):
            if a not in round_free:
                free.pop(a)  # pointer past list end: exhausted
        for b, a, jw, ptr in zip(props.get("name_b", []),
                                 props.get("name_a", []),
                                 props.get("jw_ubin", []),
                                 props.get("ptr", [])):
            jw, ptr = int(jw), int(ptr)
            cur = engaged.get(b)
            if cur is None or (-jw, a) < (-cur[0], cur[1]):
                if cur is not None:
                    # displaced incumbent returns to the pool at its next
                    # untried entry (it last proposed at cur[2])
                    free[cur[1]] = cur[2] + 1
                engaged[b] = (jw, a, ptr)
                free.pop(a, None)
                round_free.discard(a)
        # every round_free A still free proposed and lost (either to the
        # per-B fold or to a better incumbent/proposer): advance past the
        # tried entry
        for a in round_free:
            if a in free:
                free[a] += 1

    out = pd.DataFrame(
        {
            "name_a": [v[1] for v in engaged.values()],
            "name_b": list(engaged.keys()),
            "jw_ubin": np.array([v[0] for v in engaged.values()],
                                dtype=np.int64),
        }
    ).sort_values("name_a").reset_index(drop=True)
    return rd.from_pandas(out[["name_a", "name_b", "jw_ubin"]])


# --- term-frequency adjustment (Splink-style) ---------------------------------

def q_tf_adjustment(sf_dir: str):
    """Term-frequency adjustment table for exact-agreement evidence
    (the Splink/Fellegi-Sunter TF refinement; Winkler '88 "frequency-based
    matching"): agreement on a COMMON value ("small bolt") is weaker
    evidence than agreement on a rare one, so the per-value non-match
    agreement probability ``u_val = f/N`` replaces the global average
    ``u_bar = Σf(f-1) / N(N-1)`` when scoring a pair that agrees on that
    value.  Output is the per-RECORD adjustment attach (Splink's
    tf-adjustment chart): each part row carries its name-value frequency,
    the corpus size, and both probabilities, from which the weight delta
    log2(u_bar/u_val) follows on the consumer side (no transcendental
    crosses the oracle boundary — the single-division float contract).

    Distribution: one vocabulary-bounded ``grouped_sums`` pass for the
    value-frequency table (the G1 shape), a tiny tree-combined collect of
    that table (distinct name values, NOT records), then one broadcast
    map_batches attach — records never shuffle.  Exactness: ``f``, ``N``,
    ``Σf(f-1)`` are exact BIGINTs (< 2^53 up to ~10^8 dup pairs per value;
    beyond that the sum is still exact int64 driver-side, only the final
    double cast rounds, identically in both engines); ``u_val``/``u_bar``
    are single divisions of those integers, bit-equal to the oracle's
    CAST(x AS DOUBLE)/CAST(y AS DOUBLE).

    Reference semantics: the dictionary pipeline's frequency-aware key
    weighting (1st Place/src/generate_annotations.py term-precision
    filtering; SURVEY.md §2.5 G7) re-expressed as the classic linkage TF
    adjustment."""
    fr = grouped_sums(
        read(sf_dir, "part", ["p_name"]), ["p_name"], sums={}, count_as="f"
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_name", as_index=False).agg(f=("f", "sum"))

    freq = tree_to_pandas(fr, combine)
    f = freq["f"].to_numpy(np.int64)
    n = int(f.sum())
    agree2 = int((f * (f - 1)).sum())
    u_bar = np.float64(agree2) / np.float64(n * (n - 1))
    lut = freq.set_index("p_name")["f"]
    lut_ref = broadcast(lut)

    class Attach:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            fv = df["p_name"].map(self.lut).to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "p_partkey": df["p_partkey"].to_numpy(np.int64),
                    "p_name": df["p_name"].astype(str),
                    "f": fv,
                    "n_records": np.int64(n),
                    "u_val": fv.astype(np.float64) / np.float64(n),
                    "u_bar": u_bar,
                }
            )

    return read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        Attach, batch_format="pandas", concurrency=(1, 8)
    )


# --- unlinkables chart --------------------------------------------------------

def q_unlinkables(sf_dir: str, max_len_diff: int = 3, len_band: int = 4,
                  block_cap: int = FUZZY_BLOCK_CAP):
    """Unlinkables analysis (Splink's unlinkables chart): the histogram of
    each record's BEST candidate-match score under the blocking scheme —
    the self-evaluation that says what fraction of the corpus cannot link
    at any given threshold, computed BEFORE choosing one.  Candidates are
    the ``q_fuzzy_name_pairs`` universe (same first char, length diff ≤
    ``max_len_diff``) between DISTINCT name values; the best
    Jaro-Winkler per name is quantized to exact integer millis
    (floor(jw*1000), bit-equal to the oracle because the JW kernel itself
    is property-pinned bit-exact vs DuckDB) and binned by integer
    division ``// 50`` (20 bins); names with no in-block candidate land
    in bin -1.  Output: (score_bin, n_names, n_records).

    Distribution: the exploded block shuffle carries (char, band, name)
    for DISTINCT names only; per-block verification keeps one running max
    per member instead of materializing pairs; the per-name max across
    its ≤2 bands is a hash-bucketed vectorized combine; the final
    histogram is a ``grouped_sums`` over ≤ |vocabulary| slim rows.  A
    pair seen in both shared bands is harmless (max is idempotent).
    Blocks over ``block_cap`` truncate with a logged drop (`_cap_block`)."""
    fr = grouped_sums(
        read(sf_dir, "part", ["p_name"]), ["p_name"], sums={}, count_as="f"
    )
    n_buckets = default_buckets()

    def keys(df: pd.DataFrame) -> pa.Table:
        nm = df["p_name"].astype(str)
        ln = nm.str.len().to_numpy(np.int64)
        ch = nm.str[:1]
        band = ln // len_band
        out = pd.DataFrame(
            {
                "ch": pd.concat([ch, ch], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
                "p_name": pd.concat([nm, nm], ignore_index=True),
                "ln": np.concatenate([ln, ln]),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    best_schema = pa.schema([("p_name", pa.string()), ("bm", pa.int64())])

    def block_best(g: pd.DataFrame) -> pa.Table:
        g = _cap_block(g, "p_name", "unlinkables", block_cap)
        nm = g["p_name"].to_numpy(object)
        ln = g["ln"].to_numpy(np.int64)
        n = len(g)
        bm = np.full(n, -1, dtype=np.int64)
        if n >= 2:
            ia, ib = np.triu_indices(n, k=1)
            keep = np.abs(ln[ia] - ln[ib]) <= max_len_diff
            for i, j in zip(ia[keep], ib[keep]):
                if nm[i] == nm[j]:
                    continue
                m = np.int64(np.floor(jaro_winkler(nm[i], nm[j]) * 1000.0))
                if m > bm[i]:
                    bm[i] = m
                if m > bm[j]:
                    bm[j] = m
        has = bm >= 0
        return pa.Table.from_arrays(
            [pa.array(nm[has], pa.string()), pa.array(bm[has], pa.int64())],
            schema=best_schema,
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby("p_name", as_index=False).agg(bm=("bm", "max"))
        h = pd.util.hash_pandas_object(d["p_name"], index=False).to_numpy()
        d["_nb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return d

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("p_name", as_index=False).agg(bm=("bm", "max"))

    best = (
        fr.map_batches(keys, batch_format="pandas")
        .groupby(["ch", "band"])
        .map_groups(block_best, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_nb")
        .map_groups(bucket_max, batch_format="pandas")
    )
    best_ref = broadcast(best.to_pandas().set_index("p_name")["bm"])

    class Bin:
        def __init__(self):
            self.bm = ray.get(best_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            b = df["p_name"].map(self.bm)
            score_bin = np.where(
                b.isna(), np.int64(-1), b.fillna(0).to_numpy(np.int64) // 50
            ).astype(np.int64)
            return pd.DataFrame({"score_bin": score_bin, "f": df["f"]})

    binned = fr.map_batches(Bin, batch_format="pandas", concurrency=(1, 4))
    out = grouped_sums(binned, ["score_bin"], sums={"n_records": "f"},
                       count_as="n_names")
    return out.select_columns(["score_bin", "n_names", "n_records"])


# --- merged-cluster consistency audit ----------------------------------------

def q_cluster_conflicts(sf_dir: str):
    """Merged-entity consistency audit over the ``q_name_clusters``
    transitive clusters: per cluster, member/record counts and the spread
    of the attributes a clean merge should agree on (distinct brands,
    distinct types, size range) — the post-clustering QA step every MDM
    deployment runs before survivorship (conflicting attributes inside
    one resolved entity flag over-merging; Splink calls the family
    "cluster metrics").  All outputs exact integers.

    Distribution: the name→cluster map is vocabulary-bounded (distinct
    names), collected once and broadcast; the audit itself is a map-side
    partial combine — each batch reduces to distinct
    (cluster, name, brand, type) rows with count and size min/max
    partials — followed by ONE hash-bucketed vectorized combine keyed by
    cluster.  Records never shuffle raw: the exchange carries the
    distinct-combination partials only."""
    nc = tree_to_pandas(
        q_name_clusters(sf_dir),
        lambda df: df.drop_duplicates(subset=["p_name"]),
    )
    rep_ref = broadcast(nc.set_index("p_name")["cluster_rep"])
    n_buckets = default_buckets()

    class Partial:
        def __init__(self):
            self.rep = ray.get(rep_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame(
                {
                    "cluster_rep": df["p_name"].map(self.rep).astype(str),
                    "p_name": df["p_name"].astype(str),
                    "p_brand": df["p_brand"].astype(str),
                    "p_type": df["p_type"].astype(str),
                    "p_size": df["p_size"].to_numpy(np.int64),
                }
            )
            g = d.groupby(
                ["cluster_rep", "p_name", "p_brand", "p_type"], as_index=False
            ).agg(cnt=("p_size", "size"), smin=("p_size", "min"),
                  smax=("p_size", "max"))
            h = pd.util.hash_pandas_object(
                g["cluster_rep"], index=False
            ).to_numpy()
            g["_cb"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cluster_rep", as_index=False).agg(
            n_names=("p_name", "nunique"),
            n_parts=("cnt", "sum"),
            n_brands=("p_brand", "nunique"),
            n_types=("p_type", "nunique"),
            size_min=("smin", "min"),
            size_max=("smax", "max"),
        )
        for c in ("n_names", "n_parts", "n_brands", "n_types",
                  "size_min", "size_max"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        read(sf_dir, "part", ["p_name", "p_brand", "p_type", "p_size"])
        .map_batches(Partial, batch_format="pandas", concurrency=(1, 8))
        .groupby("_cb")
        .map_groups(final, batch_format="pandas")
    )


# --- deterministic matching cascade ------------------------------------------

def q_rule_cascade(sf_dir: str):
    """Deterministic linkage waterfall (Newcombe et al., Science 1959; the
    MDM "match rule cascade"): an ordered list of ever-looser exact rules
    — 1: (name, brand, size), 2: (name, brand), 3: (name) — where each
    record is resolved by the FIRST rule under which it is not a
    singleton, taking the group's min key as canonical id; records no
    rule links keep themselves at rule 0.  The per-record (rule, canon)
    pair records match provenance — which precision level produced each
    link — the audit trail deterministic MDM systems require.

    Distribution: three slim grouped (min-key, count) combines — one per
    rule, hash-bucketed vectorized, shuffling only (key, partial) rows —
    then a single broadcast attach (the lookup tables are bounded by
    distinct key-combination counts; above the broadcast budget each
    attach becomes the standard hash join, the semi_anti_filter
    threshold discipline).  No record ever shuffles."""
    n_buckets = default_buckets()
    rules = [
        ("r1", ["p_name", "p_brand", "p_size"]),
        ("r2", ["p_name", "p_brand"]),
        ("r3", ["p_name"]),
    ]

    def min_count(keys: list[str]) -> pd.DataFrame:
        ds = read(sf_dir, "part", ["p_partkey"] + keys)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(keys, as_index=False).agg(
                m=("p_partkey", "min"), c=("p_partkey", "size")
            )
            h = np.zeros(len(g), dtype=np.uint64)
            for k in keys:
                h = h * np.uint64(1099511628211) ^ pd.util.hash_pandas_object(
                    g[k], index=False
                ).to_numpy()
            g["_rb"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return g

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(keys, as_index=False).agg(
                m=("m", "min"), c=("c", "sum")
            )

        parts = (
            ds.map_batches(partial, batch_format="pandas")
            .groupby("_rb")
            .map_groups(final, batch_format="pandas")
        )
        return tree_to_pandas(parts, final)

    luts = {name: min_count(keys) for name, keys in rules}
    lut_ref = broadcast(luts)

    class Attach:
        def __init__(self):
            self.luts = ray.get(lut_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            for name, keys in rules:
                lut = self.luts[name].rename(
                    columns={"m": f"{name}_m", "c": f"{name}_c"}
                )
                d = d.merge(lut, how="left", on=keys)
            conds = [d[f"{name}_c"].to_numpy() >= 2 for name, _ in rules]
            rule = np.select(conds, [1, 2, 3], default=0).astype(np.int64)
            canon = np.select(
                conds,
                [d[f"{name}_m"].fillna(0).to_numpy(np.int64)
                 for name, _ in rules],
                default=0,
            )
            canon = np.where(
                rule == 0, d["p_partkey"].to_numpy(np.int64), canon
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "p_partkey": d["p_partkey"].to_numpy(np.int64),
                    "rule": rule,
                    "canon": canon,
                }
            )

    return read(
        sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_size"]
    ).map_batches(Attach, batch_format="pandas", concurrency=(1, 8))


# --- blocking-key skew / salting plan ----------------------------------------

SALT_TARGET_PAIRS = 1 << 16


def q_block_skew_report(sf_dir: str, len_band: int = 4,
                        target_pairs: int = SALT_TARGET_PAIRS):
    """Blocking-key skew diagnostic + SALTING PLAN — the pre-flight audit
    the north-star calls out explicitly ("explicit salting of skewed keys,
    e.g. high-frequency terms like 'pain'"): per blocking key (first char
    × length band over part names, the q_fuzzy_name_pairs scheme applied
    to RECORDS), the record count, the quadratic verification cost
    ``n_pairs = n(n−1)/2``, and the number of salt shards
    ``ceil(n_pairs / target_pairs)`` a pair-generation stage must split
    that key into so no single task exceeds ``target_pairs``
    verifications.  This is the table a planner broadcasts to decide
    which keys get salted before the block shuffle (the flagship's
    grouped fallback plan salts exactly this way,
    entity_link.py::candidate_pairs_grouped).

    All integers; integer ceiling ``(p + t − 1) // t``.  One
    ``grouped_sums`` combine over derived keys — the shuffle carries one
    (key, count) row per batch, never records."""
    ds = read(sf_dir, "part", ["p_name"])

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "band": (nm.str.len().to_numpy(np.int64) // len_band),
            }
        )

    counts = grouped_sums(
        ds.map_batches(keys, batch_format="pandas"),
        ["ch", "band"],
        sums={},
        count_as="n_records",
    )

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_records"].to_numpy(np.int64)
        pairs = n * (n - 1) // 2
        return pd.DataFrame(
            {
                "ch": df["ch"].astype(str),
                "band": df["band"].to_numpy(np.int64),
                "n_records": n,
                "n_pairs": pairs,
                "n_salts": np.maximum(
                    (pairs + target_pairs - 1) // target_pairs, 1
                ),
            }
        )

    return counts.map_batches(plan, batch_format="pandas")


# --- link prediction by common neighbors --------------------------------------

def q_predicted_links(sf_dir: str, min_common: int = 2):
    """Link prediction over the match graph by COMMON-NEIGHBOR counting
    (the simplest Liben-Nowell/Kleinberg predictor; in ER terms: two
    records each matching the same ≥2 third records are probably the
    same entity even though their direct comparison fell below
    threshold — the collective-ER signal that recovers blocked or
    misspelled bridges).  Output: non-edge pairs with
    ``cn >= min_common`` shared fuzzy-match neighbors.

    Distributed closure, no driver materialization of anything unbounded:
    undirected edge rows group by the shared endpoint (one hash shuffle);
    each group emits its neighbor pairs (C(d,2) per node of degree d —
    the wedge skew to salt/cap at web scale, the q_pair_triangles note);
    a ``grouped_sums`` counts wedges per pair = common neighbors; the
    verified-edge set (bounded by the match graph, which transitive
    clustering must hold anyway) broadcasts for the final NOT-EXISTS
    filter."""
    edges = q_fuzzy_name_pairs(sf_dir).materialize()  # feeds two consumers

    def und(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "mid": pd.concat([df["name_b"], df["name_a"]],
                                 ignore_index=True),
                "nb": pd.concat([df["name_a"], df["name_b"]],
                                ignore_index=True),
            }
        )

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        nbrs = np.unique(g["nb"].to_numpy(object))
        n = len(nbrs)
        if n < 2:
            return pd.DataFrame(
                {"name_a": pd.Series([], dtype=object),
                 "name_b": pd.Series([], dtype=object)}
            )
        ia, ib = np.triu_indices(n, k=1)
        return pd.DataFrame({"name_a": nbrs[ia], "name_b": nbrs[ib]})

    cn = grouped_sums(
        edges.map_batches(und, batch_format="pandas")
        .groupby("mid")
        .map_groups(wedge_pairs, batch_format="pandas"),
        ["name_a", "name_b"],
        sums={},
        count_as="cn",
    )
    eset = tree_to_pandas(
        edges, lambda df: df.drop_duplicates(subset=["name_a", "name_b"])
    )
    eref = broadcast(
        frozenset(eset["name_a"] + "\x1f" + eset["name_b"])
        if len(eset)
        else frozenset()
    )

    class NonEdge:
        def __init__(self):
            self.e = ray.get(eref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = df["name_a"].astype(str) + "\x1f" + df["name_b"].astype(str)
            keep = (df["cn"].to_numpy(np.int64) >= min_common) & ~key.isin(
                self.e
            ).to_numpy()
            out = df[keep]
            return pd.DataFrame(
                {
                    "name_a": out["name_a"].astype(str),
                    "name_b": out["name_b"].astype(str),
                    "cn": out["cn"].to_numpy(np.int64),
                }
            )

    return cn.map_batches(NonEdge, batch_format="pandas", concurrency=(1, 4))


# --- cluster stability across thresholds --------------------------------------

def q_threshold_stability(sf_dir: str, t_lo: float = 0.8, t_hi: float = 0.9):
    """Cluster-stability audit across two match thresholds (Splink's
    "how do clusters split as the threshold rises" diagnostic): every
    t_lo-cluster with the count of t_hi-subclusters it fractures into.
    ``n_sub == 1`` means the cluster is threshold-stable (all its edges
    are strong); a large ``n_sub`` flags a cluster glued by weak bridges
    — exactly the merges a reviewer should inspect first.

    Output: (cluster_rep, n_names, n_sub), all from the two
    ``q_name_clusters`` transitive closures (t_hi edges ⊆ t_lo edges, so
    each hi-cluster nests inside one lo-cluster and the count is exact).
    Both name→rep maps are vocabulary-bounded (distinct names); the
    final fold is a driver-side merge of those two bounded maps — the
    match_weights discipline (counts distribute, the comparison of two
    dictionary-sized labelings does not need to)."""
    lo = tree_to_pandas(
        q_name_clusters(sf_dir, threshold=t_lo),
        lambda df: df.drop_duplicates(subset=["p_name"]),
    ).rename(columns={"cluster_rep": "rep_lo"})
    hi = tree_to_pandas(
        q_name_clusters(sf_dir, threshold=t_hi),
        lambda df: df.drop_duplicates(subset=["p_name"]),
    ).rename(columns={"cluster_rep": "rep_hi"})
    m = lo.merge(hi, on="p_name")
    out = m.groupby("rep_lo", as_index=False).agg(
        n_names=("p_name", "nunique"), n_sub=("rep_hi", "nunique")
    )
    out = out.rename(columns={"rep_lo": "cluster_rep"})
    out["n_names"] = out["n_names"].astype(np.int64)
    out["n_sub"] = out["n_sub"].astype(np.int64)
    return rd.from_pandas(out)


# --- local clustering coefficient ---------------------------------------------

def q_clustering_coefficient(sf_dir: str):
    """Local clustering coefficient per match-graph node — the per-record
    cohesion signal (a node whose neighbors all match each other sits in
    a dense true-entity clique; a low-coefficient high-degree node is a
    hub gluing unrelated clusters, the first place transitive closure
    goes wrong).  Output (p_name, deg, n_tri, denom = deg·(deg−1)) with
    the coefficient left as the exact integer pair 2·n_tri / denom —
    single-division floats stay out of the oracle boundary entirely by
    emitting numerator count and denominator instead.

    Distribution: degrees are one grouped count over undirected edge
    rows; per-node triangle counts fold the ``q_pair_triangles`` closure
    (wedge join + closing-edge join, no all-pairs, no driver step)
    through one more grouped sum — each triangle (a<b<c) contributes to
    all three corners via a slim 3-row explode."""
    # materialize once: the edge set is match-graph-bounded and feeds BOTH
    # the degree count and the triangle closure
    edges = q_fuzzy_name_pairs(sf_dir).materialize()

    def und(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_name": pd.concat([df["name_a"], df["name_b"]],
                                    ignore_index=True)
            }
        )

    deg = grouped_sums(
        edges.map_batches(und, batch_format="pandas"),
        ["p_name"],
        sums={},
        count_as="deg",
    )
    tri = _triangles_of(edges)

    def corners(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_name": pd.concat(
                    [df["name_a"], df["name_b"], df["name_c"]],
                    ignore_index=True,
                )
            }
        )

    ntri = grouped_sums(
        tri.map_batches(corners, batch_format="pandas"),
        ["p_name"],
        sums={},
        count_as="n_tri",
    )
    # attach triangle counts to degrees (nodes without triangles keep 0):
    # the triangle-corner table is bounded by the verified match graph,
    # the same object transitive clustering already broadcasts
    tmap = tree_to_pandas(
        ntri, lambda df: df.groupby("p_name", as_index=False).agg(
            n_tri=("n_tri", "sum"))
    )
    tref = broadcast(tmap.set_index("p_name")["n_tri"] if len(tmap)
                     else pd.Series(dtype=np.int64))

    class Attach:
        def __init__(self):
            self.t = ray.get(tref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df["deg"].to_numpy(np.int64)
            nt = (
                df["p_name"].map(self.t).fillna(0).to_numpy(np.int64)
                if len(self.t)
                else np.zeros(len(df), np.int64)
            )
            return pd.DataFrame(
                {
                    "p_name": df["p_name"].astype(str),
                    "deg": d,
                    "n_tri": nt,
                    "denom": d * (d - 1),
                }
            )

    return deg.map_batches(Attach, batch_format="pandas", concurrency=(1, 4))


# --- weighted node pruning (meta-blocking WNP) --------------------------------

def q_wnp_pairs(sf_dir: str, block_cap: int = METABLOCK_CAP,
                n_buckets: int | None = None):
    """Weighted Node Pruning over the meta-blocking candidate graph
    (Papadakis et al. TKDE'14 WNP, the node-centric pruning that follows
    the edge-weighting scheme): keep a candidate pair iff its weight
    (shared blocking keys, ``q_metablocking_pairs``) is at least the MEAN
    weight of EITHER endpoint's candidates.  Per-record adaptive
    thresholds prune hub records' weak edges without a global cutoff —
    the standard precision-recovery step between blocking and pairwise
    scoring.  The mean test is the exact integer cross-multiplication
    ``w·deg >= Σw`` — no float thresholds.

    Distribution: node weight sums are one grouped combine over the
    directed explode of the candidate stream; the two endpoint attaches
    are hash co-partition joins (pair stream bucketed by pk_a, then by
    pk_b, node partials tagged into the same buckets) — candidate pairs
    never broadcast, node tables never leave the cluster."""
    if n_buckets is None:
        n_buckets = default_buckets()
    cand = q_metablocking_pairs(sf_dir, block_cap=block_cap)

    def directed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pk": np.concatenate(
                    [df["pk_a"].to_numpy(np.int64),
                     df["pk_b"].to_numpy(np.int64)]
                ),
                "w": np.concatenate(
                    [df["n_shared"].to_numpy(np.int64)] * 2
                ),
            }
        )

    nodes = grouped_sums(
        cand.map_batches(directed, batch_format="pandas"),
        ["pk"],
        sums={"sw": "w"},
        count_as="d",
    )

    # UNIFIED-SCHEMA tagged streams (Ray's sort-based groupby needs one
    # block schema): every row carries (pk_a, pk_b, w, sw, d, _k); node
    # rows use pk_b = -1 as the tag. extra[] columns thread the already-
    # attached side through the second shuffle.
    def attach_side(pairs: "rd.Dataset", side: str, extra: list[str]
                    ) -> "rd.Dataset":
        cols = ["pk_a", "pk_b", "w"] + extra

        def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "pk_a": df["pk_a"].to_numpy(np.int64),
                "pk_b": df["pk_b"].to_numpy(np.int64),
                "w": df["w"].to_numpy(np.int64),
            })
            for c in extra:
                out[c] = df[c].to_numpy(np.int64)
            out["sw"] = np.int64(0)
            out["d"] = np.int64(0)
            out["_k"] = df[side].to_numpy(np.int64)
            return out

        def tag_nodes(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "pk_a": df["pk"].to_numpy(np.int64),
                "pk_b": np.full(len(df), -1, np.int64),
                "w": np.int64(0),
            })
            for c in extra:
                out[c] = np.int64(0)
            out["sw"] = df["sw"].to_numpy(np.int64)
            out["d"] = df["d"].to_numpy(np.int64)
            out["_k"] = df["pk"].to_numpy(np.int64)
            return out

        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            d["_wb"] = (
                d["_k"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                % np.uint64(n_buckets)
            ).astype(np.int64)
            return d

        def join(g: pd.DataFrame) -> pd.DataFrame:
            nd = g[g["pk_b"] == -1]
            pr = g[g["pk_b"] != -1]
            empty = {c: pd.Series([], dtype=np.int64)
                     for c in cols + [f"sw_{side[-1]}", f"d_{side[-1]}"]}
            if not len(pr):
                return pd.DataFrame(empty)
            lut_s = dict(zip(nd["_k"].to_numpy(np.int64),
                             nd["sw"].to_numpy(np.int64)))
            lut_d = dict(zip(nd["_k"].to_numpy(np.int64),
                             nd["d"].to_numpy(np.int64)))
            out = pr[cols].copy()
            out[f"sw_{side[-1]}"] = pr["_k"].map(lut_s).to_numpy(np.int64)
            out[f"d_{side[-1]}"] = pr["_k"].map(lut_d).to_numpy(np.int64)
            return out

        both = (
            pairs.map_batches(tag_pairs, batch_format="pandas")
            .union(nodes.map_batches(tag_nodes, batch_format="pandas"))
            .map_batches(bucket, batch_format="pandas")
        )
        return both.groupby("_wb").map_groups(join, batch_format="pandas")

    cand_w = cand.map_batches(
        lambda df: pd.DataFrame({
            "pk_a": df["pk_a"].to_numpy(np.int64),
            "pk_b": df["pk_b"].to_numpy(np.int64),
            "w": df["n_shared"].to_numpy(np.int64),
        }),
        batch_format="pandas",
    )
    withA = attach_side(cand_w, "pk_a", extra=[])
    withB = attach_side(withA, "pk_b", extra=["sw_a", "d_a"])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        keep = (w * df["d_a"].to_numpy(np.int64)
                >= df["sw_a"].to_numpy(np.int64)) | (
            w * df["d_b"].to_numpy(np.int64)
            >= df["sw_b"].to_numpy(np.int64)
        )
        out = df[keep]
        return pd.DataFrame(
            {
                "pk_a": out["pk_a"].to_numpy(np.int64),
                "pk_b": out["pk_b"].to_numpy(np.int64),
                "n_shared": out["w"].to_numpy(np.int64),
            }
        )

    return withB.map_batches(gate, batch_format="pandas")


# --- unsupported (triangle-free) match edges -----------------------------------

def q_unsupported_edges(sf_dir: str, threshold: float = 0.85):
    """Match edges supported by NO triangle — the weak links transitive
    clustering should re-verify before trusting (an edge inside a
    triangle has independent corroboration; a triangle-free edge is the
    classic false-positive bridge between two true entities).  The
    complement of ``q_pair_triangles`` folded back onto the edge set.

    Distribution: triangles stream through a 3-edge explode into the
    same canonical (name_a, name_b) key space; the supported-edge set
    (bounded by edges-in-triangles ⊆ the verified match graph) collects
    once and broadcasts for a vectorized anti-filter over the edge
    stream — the semi_anti_filter shape.

    Default threshold 0.85 (not the family's 0.8): at 0.8 the fixture
    match graph is dense enough that EVERY edge sits in a triangle — a
    vacuous audit; 0.85 leaves a meaningful unsupported set while the
    oracle applies the identical threshold."""
    edges = q_fuzzy_name_pairs(sf_dir, threshold=threshold).materialize()
    tri = _triangles_of(edges)

    def tri_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "name_a": pd.concat(
                    [df["name_a"], df["name_b"], df["name_a"]],
                    ignore_index=True,
                ),
                "name_b": pd.concat(
                    [df["name_b"], df["name_c"], df["name_c"]],
                    ignore_index=True,
                ),
            }
        )

    sup = tree_to_pandas(
        tri.map_batches(tri_edges, batch_format="pandas"),
        lambda df: df.drop_duplicates(),
    )
    sref = broadcast(
        frozenset(sup["name_a"] + "\x1f" + sup["name_b"])
        if len(sup)
        else frozenset()
    )

    class Anti:
        def __init__(self):
            self.s = ray.get(sref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            key = df["name_a"].astype(str) + "\x1f" + df["name_b"].astype(str)
            out = df[~key.isin(self.s).to_numpy()]
            # Arrow output with an explicit schema: empty pandas string
            # blocks lose their schema in Ray's estimator (common.py note)
            return pa.Table.from_arrays(
                [pa.array(out["name_a"].astype(str), pa.string()),
                 pa.array(out["name_b"].astype(str), pa.string())],
                names=["name_a", "name_b"],
            )

    return edges.map_batches(Anti, batch_format="pandas", concurrency=(1, 4))


# --- truth discovery (source-reliability data fusion) -------------------------

def q_truth_discovery(sf_dir: str):
    """Source-reliability data fusion (truth discovery, Dong/Berti-Equille
    VLDB'09 tutorial lineage; ACCU-lite): conflicting per-object claims
    from multiple sources are resolved by TWO exact-integer rounds —
    majority vote -> per-source accuracy -> accuracy-weighted revote.
    In ER terms this is conflict resolution ACROSS sources (the
    survivorship step golden_user_profile does by fixed priority, done
    instead with LEARNED source weights — the data-fusion upgrade of the
    rule_cascade family).

    Fixture mapping: each event stream (``event_type``) is a source
    claiming a bucketed reading ``props.k // 10`` for object ``user_id``;
    the latest claim per (object, source) wins (ts desc, event_id desc —
    the latest_user_state contract).

    Exact-arithmetic contract: source accuracy is the integer
    ``num * 1_000_000 // den`` (floor micro-units), so round-2 weighted
    votes are int64 sums — no float crosses the oracle boundary and
    block order can never flip an argmax.  Ties break to the SMALLEST
    value bucket in both rounds (both engines).

    Scale shape: claims are a keep-latest combine bounded by
    |objects| x |sources| (slim int rows; map-side latest per batch);
    vote counts and weighted votes are ``grouped_sums``; per-object
    argmaxes are user-bucketed vectorized sort+head (never per-group
    Python); truth1 co-partitions with claims through a tagged union
    into the SAME user bucket (no corpus-scale broadcast); only the
    per-SOURCE accuracy table (dictionary-bounded) is collected and
    broadcast."""
    ds = read(sf_dir, "events",
              ["event_id", "user_id", "event_type", "ts", "props"])
    n_buckets = default_buckets()

    def batch_latest(df: pd.DataFrame) -> pd.DataFrame:
        # exact top-level JSON parse (json.loads per row): the oracle's
        # json_extract('$.k') resolves only the TOP-LEVEL key, which no
        # regex can mirror once props nest; missing/non-numeric -> 0
        # (the oracle's COALESCE). Division below TRUNCATES to mirror
        # DuckDB's `//` on negatives (-5 // 10 is 0 there, -1 under
        # Python floor division).
        import json as _json

        def _k_of(p) -> int:
            try:
                val = _json.loads(p).get("k", 0)
            except Exception:
                return 0
            if isinstance(val, bool) or not isinstance(val, (int, float)):
                return 0
            return int(round(val))  # banker's rounding = DuckDB CAST

        kv = np.fromiter(
            (_k_of(p) for p in df["props"]), np.int64, len(df)
        )
        g = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "src": df["event_type"].astype(str),
                "v": np.sign(kv) * (np.abs(kv) // 10),
                "ts": df["ts"].to_numpy(),
                "event_id": df["event_id"].to_numpy(np.int64),
            }
        )
        g = g.sort_values(["ts", "event_id"]).drop_duplicates(
            subset=["user_id", "src"], keep="last"
        )
        g["_ub"] = (
            g["user_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    def bucket_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).drop_duplicates(
            subset=["user_id", "src"], keep="last"
        )
        return g[["user_id", "src", "v"]].reset_index(drop=True)

    claims = (
        ds.map_batches(batch_latest, batch_format="pandas")
        .groupby("_ub")
        .map_groups(bucket_latest, batch_format="pandas")
    ).materialize()  # |objects| x |sources| slim rows; three consumers

    def ubucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["_ub"] = (
            d["user_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return d

    # round 1: unweighted majority per object (ties -> smallest bucket)
    vote1 = grouped_sums(claims, ["user_id", "v"], sums={}, count_as="c")

    def argmax1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "c", "v"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates(subset=["user_id"], keep="first")
        return g[["user_id", "v"]].rename(columns={"v": "t1"})

    truth1 = (
        vote1.map_batches(ubucket, batch_format="pandas")
        .groupby("_ub")
        .map_groups(argmax1, batch_format="pandas")
    )

    # per-source accuracy: claims co-partition with truth1 by user bucket
    # (tagged union — truth rows carry src="" sentinel), then one
    # dictionary-bounded grouped_sums by source.
    def tag_truth(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "src": "",
                "v": df["t1"].to_numpy(np.int64),
            }
        )

    def acc_partial(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["src"] == ""]
        c = g[g["src"] != ""]
        if not len(c):
            return pd.DataFrame(
                {"src": pd.Series([], dtype=object),
                 "num": pd.Series([], dtype=np.int64),
                 "den": pd.Series([], dtype=np.int64)}
            )
        t1_of = dict(zip(t["user_id"].to_numpy(np.int64),
                         t["v"].to_numpy(np.int64)))
        hit = (
            c["user_id"].map(t1_of).to_numpy(np.int64)
            == c["v"].to_numpy(np.int64)
        ).astype(np.int64)
        out = pd.DataFrame({"src": c["src"].to_numpy(object), "num": hit,
                            "den": np.ones(len(c), np.int64)})
        return out.groupby("src", as_index=False).agg(
            num=("num", "sum"), den=("den", "sum")
        )

    acc = grouped_sums(
        claims.union(truth1.map_batches(tag_truth, batch_format="pandas"))
        .map_batches(ubucket, batch_format="pandas")
        .groupby("_ub")
        .map_groups(acc_partial, batch_format="pandas"),
        ["src"],
        sums={"num": "num", "den": "den"},
    ).to_pandas()  # dictionary-bounded: one row per source
    wt_of = {
        s: int(n) * 1_000_000 // int(d)
        for s, n, d in zip(acc["src"], acc["num"], acc["den"])
    }
    wref = broadcast(wt_of)

    # round 2: accuracy-weighted revote
    class Weigh:
        def __init__(self):
            self.wt = ray.get(wref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df[["user_id", "v"]].copy()
            d["wt"] = df["src"].map(self.wt).to_numpy(np.int64)
            return d

    vote2 = grouped_sums(
        claims.map_batches(Weigh, batch_format="pandas", concurrency=(1, 4)),
        ["user_id", "v"],
        sums={"weight": "wt"},
        count_as="n_support",
    )

    def argmax2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "weight", "v"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates(subset=["user_id"], keep="first")
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "value_bin": g["v"].to_numpy(np.int64),
                "weight": g["weight"].to_numpy(np.int64),
                "n_support": g["n_support"].to_numpy(np.int64),
            }
        )

    return (
        vote2.map_batches(ubucket, batch_format="pandas")
        .groupby("_ub")
        .map_groups(argmax2, batch_format="pandas")
    )


# --- group linkage (set-valued entities) --------------------------------------

GROUP_LINK_HOT_DF_CAP = 256


def q_group_linkage(sf_dir: str, t_num: int = 1, t_den: int = 10,
                    hot_df_cap: int = GROUP_LINK_HOT_DF_CAP,
                    n_buckets: int | None = None):
    """GROUP linkage (On Group Linkage, Ye et al. ICDE'07): entities
    represented as SETS of members are linked by set Jaccard — here
    customer pairs whose ordered-part sets overlap with
    ``|A∩B| / |A∪B| >= t_num/t_den``.  The set-valued complement of the
    record-level matchers: two accounts that buy nearly the same parts
    are one household even when no name/attribute agrees.

    The threshold is the exact integer cross-multiplication
    ``t_den·inter >= t_num·(|A| + |B| − inter)`` — no float division.

    Plan (the containment_pairs inverted-list shape, symmetric): the
    member table (cust, part) is made distinct by a map-side+bucketed
    combine; part-keyed posting lists emit canonical C(df,2) customer
    pairs (members with df > ``hot_df_cap`` are dropped WITH a logged
    count — stop-members carry no linkage signal and cost quadratic
    pairs; the oracle applies the SAME cap); a ``grouped_sums`` folds the
    exact intersection; set sizes co-partition into cust_a- then
    cust_b-keyed tagged bucket combines (hash co-partition joins — the
    corpus-sized size table is never broadcast)."""
    if n_buckets is None:
        n_buckets = default_buckets()
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    cp_raw = li.join(
        orders, "inner", num_partitions=n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    # distinct (cust, part) membership: map-side distinct + bucketed combine
    def dpart(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "c": df["o_custkey"].to_numpy(np.int64),
                "p": df["l_partkey"].to_numpy(np.int64),
            }
        ).drop_duplicates()
        g["_mb"] = (
            (g["c"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ^ g["p"].to_numpy(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    members = (
        cp_raw.map_batches(dpart, batch_format="pandas")
        .groupby("_mb")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["c", "p"])[["c", "p"]],
            batch_format="pandas",
        )
    ).materialize()  # distinct membership; two consumers (posts + sizes)

    def post(df: pd.DataFrame) -> pd.DataFrame:
        g = df.copy()
        g["_pb"] = (
            g["p"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p", "c"], kind="mergesort")
        part_ids = g["p"].to_numpy(np.int64)
        cust = g["c"].to_numpy(np.int64)
        n = len(g)
        a_parts: list = []
        b_parts: list = []
        dropped = 0
        start = 0
        for i in range(1, n + 1):
            if i < n and part_ids[i] == part_ids[start]:
                continue
            d = i - start
            if d > hot_df_cap:
                dropped += 1
            elif d >= 2:
                ia, ib = np.triu_indices(d, k=1)
                seg = cust[start:i]
                a_parts.append(seg[ia])
                b_parts.append(seg[ib])
            start = i
        if dropped:
            logger.warning(
                "group_linkage: dropped %d hot members (df > %d)",
                dropped, hot_df_cap,
            )
        a = np.concatenate(a_parts) if a_parts else np.array([], np.int64)
        b = np.concatenate(b_parts) if b_parts else np.array([], np.int64)
        return pd.DataFrame(
            {"c_a": a.astype(np.int64), "c_b": b.astype(np.int64),
             "n": np.ones(len(a), np.int64)}
        )

    inter = grouped_sums(
        members.map_batches(post, batch_format="pandas")
        .groupby("_pb")
        .map_groups(pairs_of_bucket, batch_format="pandas"),
        ["c_a", "c_b"],
        {"n_inter": "n"},
    )

    # sizes |set(cust)| as a tagged stream (c_b = -1 sentinel);
    # materialized: it feeds BOTH the c_a and c_b attach unions
    sizes = grouped_sums(members, ["c"], sums={}, count_as="n_mem"
                         ).materialize()

    def size_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_a": df["c"].to_numpy(np.int64),
                "c_b": np.full(len(df), -1, np.int64),
                "n_inter": df["n_mem"].to_numpy(np.int64),
            }
        )

    def attach(key: str, out_col: str):
        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            d["_ab"] = (
                d[key].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                % np.uint64(n_buckets)
            ).astype(np.int64)
            return d

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            sz = g[g["c_b"] == -1]
            size_of = dict(zip(sz["c_a"].to_numpy(np.int64),
                               sz["n_inter"].to_numpy(np.int64)))
            p = g[g["c_b"] != -1].copy()
            if not len(p):
                cols = {c: pd.Series([], dtype=np.int64)
                        for c in list(g.columns) + [out_col]
                        if c not in ("_ab",)}
                return pd.DataFrame(cols)
            p[out_col] = p[key].map(size_of).to_numpy(np.int64)
            return p.drop(columns=["_ab"])

        return add_bucket, fold

    ab1, f1 = attach("c_a", "n_a")
    with_a = (
        inter.map_batches(ab1, batch_format="pandas")
        .union(sizes.map_batches(size_rows, batch_format="pandas")
               .map_batches(ab1, batch_format="pandas"))
        .groupby("_ab")
        .map_groups(f1, batch_format="pandas")
    )

    # second co-partition keyed by c_b; size rows re-tagged on that key
    def size_rows_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_a": np.full(len(df), -1, np.int64),
                "c_b": df["c"].to_numpy(np.int64),
                "n_inter": df["n_mem"].to_numpy(np.int64),
                "n_a": np.full(len(df), -1, np.int64),
            }
        )

    def add_bucket_b(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["_ab"] = (
            d["c_b"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return d

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        sz = g[g["c_a"] == -1]
        size_of = dict(zip(sz["c_b"].to_numpy(np.int64),
                           sz["n_inter"].to_numpy(np.int64)))
        p = g[g["c_a"] != -1]
        if not len(p):
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ["c_a", "c_b", "n_inter", "n_union"]}
            )
        nb = p["c_b"].map(size_of).to_numpy(np.int64)
        ni = p["n_inter"].to_numpy(np.int64)
        union = p["n_a"].to_numpy(np.int64) + nb - ni
        keep = t_den * ni >= t_num * union
        out = p[keep]
        return pd.DataFrame(
            {
                "c_a": out["c_a"].to_numpy(np.int64),
                "c_b": out["c_b"].to_numpy(np.int64),
                "n_inter": ni[keep],
                "n_union": union[keep],
            }
        )

    return (
        with_a.map_batches(add_bucket_b, batch_format="pandas")
        .union(sizes.map_batches(size_rows_b, batch_format="pandas")
               .map_batches(add_bucket_b, batch_format="pandas"))
        .groupby("_ab")
        .map_groups(gate, batch_format="pandas")
    )


# --- distributed lexicographic id assignment (VERDICT r4 #3) ------------------

# Driver guard for the fuzzy-graph family's dense O(n) numpy node state
# (cc_pivot's undecided/in_mis masks, bfs_depth's packed carrier,
# progressive_er's union-find parents, the id→name output attach array).
# These replays are inherently driver-folded; above this bound the fold
# would silently become the driver-OOM hazard VERDICT r4 #3 names, so it
# raises loudly instead.
FUZZY_GRAPH_NODE_MAX = 1 << 26
# name→id attach plan switch: at or below this many distinct names the
# (name → nid) map broadcasts once (ray.put, C-hashtable pd.Series);
# above it the attach is two empty-safe hash joins — the semi_anti_filter
# dual-plan discipline.
IDMAP_BROADCAST_MAX = 4_000_000
NAME_BUCKET_CHARS = 2
# q_two_hop_reach's dense n×n boolean adjacency matmul: 32768² bits ≈
# 128 MiB per matrix — the far tighter driver bound of that one consumer.
TWO_HOP_NODE_MAX = 1 << 15


def _ranked_name_ids(sf_dir: str, table: str = "part", col: str = "p_name"):
    """Distributed DENSE lexicographic int ids for a column's distinct
    values — no driver-side vocabulary materialization, no single-thread
    driver sort (VERDICT r4 #3: the old ``sorted(distinct.to_pandas())``
    + Python dict pattern is a driver OOM + serial sort at open-world
    name cardinalities). Plan (rank via bucket histogram + cumulative
    offsets, all in the cluster):

    1. distributed distinct (``distinct_column``);
    2. ``NAME_BUCKET_CHARS``-prefix bucket histogram via ``grouped_sums``
       — the driver folds only the bucket dictionary (≤ |alphabet|^k,
       never the vocabulary);
    3. bucket base offsets = cumsum of counts in bucket sort order.
       Prefix buckets totally order the values: for bucket keys p < q,
       every member of p precedes every member of q — either neither is
       a prefix of the other (extensions inherit the order), or p is
       shorter than the prefix length, in which case p's only member is
       the string p itself;
    4. within-bucket local sort + ``base + arange`` in
       ``groupby(bucket).map_groups`` — bucket-sized work, distributed
       across buckets (skew caveat: a vocabulary concentrated under one
       prefix serializes into one group; widen ``NAME_BUCKET_CHARS`` for
       such corpora).

    Returns ``(ids, n)``: a Dataset ``(col, nid:int64)`` with nid = rank
    in global sorted order (a cheap lazy projection over a materialized
    per-bucket table), and the distinct count.

    Cost: ONE shuffle total — the prefix-bucket groupby performs dedup,
    local sort AND local rank together, so ranked ids cost the same
    exchange count as a plain ``distinct_column`` (r5 perf fix: the
    first cut ran distinct + histogram + rank as three passes and
    doubled the family's fixture-scale latency)."""
    ds = read(sf_dir, table, [col])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype(str).drop_duplicates()  # map-side combine
        out = pd.DataFrame({col: s})
        out["_bkt"] = out[col].str[:NAME_BUCKET_CHARS]
        return out

    local_schema = pa.schema(
        [(col, pa.string()), ("_bkt", pa.string()), ("local", pa.int64())]
    )

    def rank_group(g: pd.DataFrame) -> pa.Table:
        vals = np.unique(g[col].to_numpy(object))  # dedup + sorted
        return pa.Table.from_arrays(
            [pa.array(vals, pa.string()),
             pa.array(np.repeat(g["_bkt"].iloc[0], len(vals)), pa.string()),
             pa.array(np.arange(len(vals), dtype=np.int64))],
            schema=local_schema,
        )

    ids_local = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(rank_group, batch_format="pandas")
        .materialize()
    )
    # bucket histogram: one slim fold over the vocabulary-bounded table
    cnt = (
        ids_local.map_batches(
            lambda df: df.groupby("_bkt", as_index=False).agg(
                n=("local", "size")),
            batch_format="pandas",
        ).to_pandas()
    )
    cnt = cnt.groupby("_bkt", as_index=False)["n"].sum() \
        .sort_values("_bkt", kind="mergesort")
    counts = cnt["n"].to_numpy(np.int64)
    bases = dict(zip(cnt["_bkt"].tolist(),
                     (np.cumsum(counts) - counts).tolist()))
    n = int(counts.sum())
    base_ref = broadcast(bases)

    id_schema = pa.schema([(col, pa.string()), ("nid", pa.int64())])

    def add_base(df: pd.DataFrame) -> pa.Table:
        # plain task, not an actor pool: ray.get of the broadcast ref is a
        # local object-store hit after the first fetch, and pool spin-up
        # would dominate at ~seconds per consumer execution (r5 perf fix)
        bases_ = ray.get(base_ref)
        nid = (
            df["_bkt"].map(bases_).to_numpy(np.int64)
            + df["local"].to_numpy(np.int64)
        )
        return pa.Table.from_arrays(
            [pa.array(df[col].to_numpy(object), pa.string()),
             pa.array(nid)],
            schema=id_schema,
        )

    ids = ids_local.map_batches(add_base, batch_format="pandas")
    return ids, n


def _ids_name_arr(ids, n: int) -> np.ndarray:
    """Driver id→name attach array for the sequential-replay consumers:
    a guarded, SORT-FREE collect (rank ids came from the cluster; the
    driver only scatters batches into a preallocated array). Bounded by
    ``FUZZY_GRAPH_NODE_MAX`` — callers raise before reaching here."""
    if n > FUZZY_GRAPH_NODE_MAX:  # defense in depth; callers guard first
        raise ValueError(
            f"id→name attach of {n} names exceeds FUZZY_GRAPH_NODE_MAX "
            f"({FUZZY_GRAPH_NODE_MAX}); this consumer holds O(n) driver "
            "state by design — shard the vocabulary or raise the bound "
            "on a bigger driver"
        )
    arr = np.empty(n, dtype=object)
    for b in ids.iter_batches(batch_format="pandas"):
        arr[b["nid"].to_numpy(np.int64)] = b[ids.schema().names[0]].to_numpy(object)
    return arr


def _edges_from_pairs(pairs, ids, n: int):
    """Attach int ids to a (name_a, name_b) pair Dataset → (u, v) edges
    with u < v. Dual plan: ≤ ``IDMAP_BROADCAST_MAX`` names broadcasts the
    (name → nid) map once via ray.put (pd.Series — C hashtable, not a
    Python dict); above it, two empty-safe hash joins (ids side carries
    distinct keys, so no row multiplication)."""
    col = ids.schema().names[0]
    if n <= IDMAP_BROADCAST_MAX:
        idp = ids.to_pandas()  # bounded by the measured distinct count
        ser_ref = broadcast(
            pd.Series(idp["nid"].to_numpy(np.int64),
                      index=idp[col].astype(str))
        )

        def to_edges(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {"u": pd.Series([], dtype=np.int64),
                     "v": pd.Series([], dtype=np.int64)}
                )
            ser = ray.get(ser_ref)  # local object-store hit after fetch #1
            a = df["name_a"].map(ser).to_numpy(np.int64)
            b = df["name_b"].map(ser).to_numpy(np.int64)
            return pd.DataFrame(
                {"u": np.minimum(a, b), "v": np.maximum(a, b)}
            )

        return pairs.map_batches(to_edges, batch_format="pandas")

    n_part = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    j = pairs.join(ids, "inner", num_partitions=n_part,
                   on=("name_a",), right_on=(col,))
    j = j.rename_columns({"nid": "nid_a"}).join(
        ids, "inner", num_partitions=n_part,
        on=("name_b",), right_on=(col,))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        a = df["nid_a"].to_numpy(np.int64)
        b = df["nid"].to_numpy(np.int64)
        return pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b)})

    return j.map_batches(finish, batch_format="pandas")


def jw_micro_scorer(name_ref):
    """Batch scorer factory: floor-micro-unit Jaro-Winkler over (u, v)
    edge batches via the per-worker cached DuckDB kernel ``batch_jw``
    (VERDICT r4 #4 — replaces per-pair Python JW loops; values are
    property-test-pinned identical to ``similarity.jaro_winkler``). A
    plain task fn, not an actor pool: the kernel connection caches per
    worker process and the broadcast id→name array is a local
    object-store hit after the first fetch."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"u": pd.Series([], dtype=np.int64),
                 "v": pd.Series([], dtype=np.int64),
                 "name_a": pd.Series([], dtype=object),
                 "name_b": pd.Series([], dtype=object),
                 "jw_micro": pd.Series([], dtype=np.int64)}
            )
        names = ray.get(name_ref)
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        a = names[u]
        b = names[v]
        jw = batch_jw(a, b)
        return pd.DataFrame(
            {"u": u, "v": v, "name_a": a, "name_b": b,
             "jw_micro": np.floor(jw * 1_000_000).astype(np.int64)}
        )

    return score


# --- correlation clustering (KwikCluster / CC-Pivot) --------------------------

CCPIVOT_MAX_ROUNDS = 64


def _fuzzy_edge_graph(sf_dir: str, threshold: float):
    """Shared UNCAPPED fuzzy-name match graph (q_cc_pivot / q_bfs_depth /
    q_weakest_link / q_two_hop_reach / q_progressive_er): distributed
    rank ids (``_ranked_name_ids`` — cluster-computed, identical to the
    old sorted-order ids), edges from ``q_fuzzy_name_pairs`` with the cap
    disabled — these ops' sequential oracles brute-force the full
    predicate, so the executed graph must be lossless (the salting/
    fan-out rationale, not the lossy block_cap truncation of the
    pair-emission family). Returns (name_arr id→name object array,
    materialized edges(u, v) Dataset with u < v, ids Dataset)."""
    ids, n = _ranked_name_ids(sf_dir)
    if n > FUZZY_GRAPH_NODE_MAX:
        raise ValueError(
            f"fuzzy-graph family: {n} distinct names exceeds "
            f"FUZZY_GRAPH_NODE_MAX ({FUZZY_GRAPH_NODE_MAX}); these "
            "consumers hold O(n) dense driver node state (masks/carriers/"
            "parents) by design"
        )
    pairs = q_fuzzy_name_pairs(sf_dir, threshold=threshold,
                               block_cap=1 << 62)
    edges = _edges_from_pairs(pairs, ids, n).materialize()
    return _ids_name_arr(ids, n), edges, ids


def q_cc_pivot(sf_dir: str, threshold: float = 0.8,
               max_rounds: int = CCPIVOT_MAX_ROUNDS):
    """Correlation clustering of the fuzzy-name match graph by
    KwikCluster / CC-Pivot (Ailon-Charikar-Newman JACM'08) with the
    DETERMINISTIC id order: pivots = the lexicographically-first maximal
    independent set; every non-pivot joins its SMALLEST pivot neighbor.
    The 3-approximation alternative to connected components
    (q_name_clusters) that does NOT chain weak bridges — a pivot only
    claims DIRECT neighbors, so the pain/pan/pin chain splits instead of
    collapsing into one entity.

    Parallel = sequential: greedy-by-id KwikCluster's pivot set is
    exactly the lex-first MIS, and iterated LOCAL MINIMA over the
    undecided subgraph computes that MIS (Blelloch-Fineman-Shun
    SPAA'12).  Round-count caveat: their O(log n) w.h.p. bound needs
    RANDOM priorities; the DETERMINISTIC id order here can take
    O(longest ascending-id path) rounds (fuzzy-match graphs sort
    similar names adjacently, so ascending chains are the common worst
    case).  After ``max_rounds`` the residual undecided subgraph —
    vocabulary-bounded, and shrunk by every completed round — is
    finished by the exact sequential walk on the driver (same result by
    the equivalence above, so the cap changes cost, never output).  The
    assignment rep(v) = min pivot neighbor is one grouped-min pass over
    the edge set.  The sequential-walk oracle pins the equivalence.

    Scale shape: each round is one vectorized pass over the (broadcast-
    filtered) edge Dataset + a node-bounded grouped-min collect — the
    name_clusters vocabulary-bounded discipline; no per-node Python, no
    quadratic structure."""
    name_arr, edges, _ids = _fuzzy_edge_graph(sf_dir, threshold)
    n = len(name_arr)
    undecided = np.ones(n, dtype=bool)
    in_mis = np.zeros(n, dtype=bool)

    def min_nbr_partial(und_ref):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            und = ray.get(und_ref)
            u = df["u"].to_numpy(np.int64)
            v = df["v"].to_numpy(np.int64)
            live = und[u] & und[v]
            u, v = u[live], v[live]
            g = pd.DataFrame(
                {"node": np.concatenate([u, v]),
                 "nbr": np.concatenate([v, u])}
            )
            return g.groupby("node", as_index=False).agg(nbr=("nbr", "min"))
        return fn

    for _ in range(max_rounds):
        if not undecided.any():
            break
        und_ref = broadcast(undecided.copy())
        mn = tree_to_pandas(
            edges.map_batches(min_nbr_partial(und_ref),
                              batch_format="pandas"),
            lambda df: df.groupby("node", as_index=False).agg(
                nbr=("nbr", "min")),
        )  # node-bounded: one row per undecided node with a live edge
        has_nbr = np.zeros(n, dtype=bool)
        min_nbr = np.full(n, n, dtype=np.int64)
        if len(mn):
            nd = mn["node"].to_numpy(np.int64)
            has_nbr[nd] = True
            min_nbr[nd] = mn["nbr"].to_numpy(np.int64)
        ids = np.arange(n, dtype=np.int64)
        pivots = undecided & (~has_nbr | (ids < min_nbr))
        if not pivots.any():
            break
        in_mis |= pivots
        undecided &= ~pivots
        # neighbors of new pivots decide OUT (they have a MIS neighbor)
        piv_ref = broadcast(pivots)

        def out_partial(df: pd.DataFrame) -> pd.DataFrame:
            piv = ray.get(piv_ref)
            u = df["u"].to_numpy(np.int64)
            v = df["v"].to_numpy(np.int64)
            hit = np.concatenate([v[piv[u]], u[piv[v]]])
            return pd.DataFrame({"node": np.unique(hit)})

        out_nodes = tree_to_pandas(
            edges.map_batches(out_partial, batch_format="pandas"),
            lambda df: df.drop_duplicates(),
        )
        if len(out_nodes):
            undecided[out_nodes["node"].to_numpy(np.int64)] = False
    if undecided.any():
        # residual sequential completion (deterministic id order can
        # leave a long ascending chain; see the docstring's round-count
        # caveat). The residual edge set is vocabulary-bounded and the
        # walk is the oracle's own algorithm, so output is unchanged.
        und_ref = broadcast(undecided.copy())
        live = tree_to_pandas(
            edges.map_batches(
                lambda df, _u=und_ref: df[
                    ray.get(_u)[df["u"].to_numpy(np.int64)]
                    & ray.get(_u)[df["v"].to_numpy(np.int64)]
                ],
                batch_format="pandas",
            ),
            lambda df: df.drop_duplicates(),
        )
        adj: dict = {}
        for uu, vv in zip(live["u"].to_numpy(np.int64),
                          live["v"].to_numpy(np.int64)):
            adj.setdefault(int(uu), []).append(int(vv))
            adj.setdefault(int(vv), []).append(int(uu))
        for x in np.flatnonzero(undecided):
            x = int(x)
            if not undecided[x]:
                continue
            in_mis[x] = True
            undecided[x] = False
            for nb in adj.get(x, ()):
                undecided[nb] = False

    # assignment: rep(v) = min pivot neighbor, one grouped-min pass
    mis_ref = broadcast(in_mis.copy())

    def assign_partial(df: pd.DataFrame) -> pd.DataFrame:
        mis = ray.get(mis_ref)
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        g = pd.DataFrame(
            {"node": np.concatenate([u[mis[v] & ~mis[u]], v[mis[u] & ~mis[v]]]),
             "rep": np.concatenate([v[mis[v] & ~mis[u]], u[mis[u] & ~mis[v]]])}
        )
        return g.groupby("node", as_index=False).agg(rep=("rep", "min"))

    asg = tree_to_pandas(
        edges.map_batches(assign_partial, batch_format="pandas"),
        lambda df: df.groupby("node", as_index=False).agg(rep=("rep", "min")),
    )
    rep = np.arange(n, dtype=np.int64)
    if len(asg):
        rep[asg["node"].to_numpy(np.int64)] = asg["rep"].to_numpy(np.int64)
    out = pd.DataFrame(
        {"p_name": name_arr, "cluster_rep": name_arr[rep]}
    )
    return rd.from_pandas(out)


# --- salted blocked pair generation (executed skew plan) ----------------------

SALT_SHARD_CAP = 4


def q_salted_pairs(sf_dir: str, threshold: float = 0.8,
                   max_len_diff: int = 3, len_band: int = 4,
                   shard_cap: int = SALT_SHARD_CAP):
    """EXECUTED key salting: the same candidate-pair semantics as
    ``q_fuzzy_name_pairs`` (identical oracle predicate), computed through
    the skew plan ``q_block_skew_report`` only *plans* — every block is
    split into ``s = ceil(n / shard_cap)`` member shards and its pair
    work fans out over the C(s+1, 2) SHARD-PAIR tasks of the triangle
    distribution (each member replicates to ``s`` tasks; an (i, j) task
    emits only shard_i × shard_j cross pairs, an (i, i) task only its
    within-shard pairs), so no single task ever holds a hot key's full
    quadratic block.  This is the north rule's "explicit salting of
    skewed keys" as a driver-gated operator: the oracle (the UNCAPPED
    blocked predicate) proves the salted execution emits EXACTLY the
    full pair set.  Deliberate contrast with ``q_fuzzy_name_pairs``:
    that op bounds hot blocks by TRUNCATING at ``block_cap`` (lossy,
    logged); this op bounds per-task work by fanning the same block
    out over shard pairs (lossless) — salting REPLACES the cap, which
    is the whole point of the plan.  The two emit identical sets only
    while every block is under the other's cap (true on the fixtures;
    the invariant test pins equality against an uncapped fuzzy run).

    ``shard_cap=4`` forces real salting on the fixtures (the distinct
    part-name vocabulary is small, so fuzzy blocks run 4-8 members), and
    the gate exercises genuine multi-shard fan-out, not a degenerate
    s=1; at corpus scale the cap is the per-task pair budget knob.  Two passes: a slim block-count
    combine (block dictionary-bounded) broadcasts the per-block shard
    counts; the emit pass replicates (ch, band, shard-pair, name) rows —
    names only, ~s× the vocabulary, never records."""
    from ..functions.hashing import stable_u64

    names = distinct_column(read(sf_dir, "part", ["p_name"]), "p_name")
    nm = names.materialize()

    def block_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df["p_name"].astype(str)
        ln = s.str.len().to_numpy(np.int64)
        band = ln // len_band
        return pd.DataFrame(
            {
                "ch": pd.concat([s.str[:1], s.str[:1]], ignore_index=True),
                "band": np.concatenate([band, band + 1]),
            }
        )

    counts = tree_to_pandas(
        grouped_sums(
            nm.map_batches(block_rows, batch_format="pandas"),
            ["ch", "band"], sums={}, count_as="n",
        ),
        lambda df: df.groupby(["ch", "band"], as_index=False).agg(
            n=("n", "sum")),
    )  # block-dictionary bounded
    s_of = {
        (c, int(b)): max(1, -(-int(n) // shard_cap))
        for c, b, n in zip(counts["ch"], counts["band"], counts["n"])
    }
    s_ref = broadcast(s_of)

    class Emit:
        def __init__(self):
            self.s_of = ray.get(s_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows_ch: list = []
            rows_band: list = []
            rows_i: list = []
            rows_j: list = []
            rows_nm: list = []
            rows_ln: list = []
            rows_sh: list = []
            for name in df["p_name"].astype(str):
                ch = name[:1]
                ln = len(name)
                for band in (ln // len_band, ln // len_band + 1):
                    s = self.s_of.get((ch, band), 1)
                    i = stable_u64(name) % s
                    for j in range(s):
                        rows_ch.append(ch)
                        rows_band.append(band)
                        rows_i.append(min(i, j))
                        rows_j.append(max(i, j))
                        rows_nm.append(name)
                        rows_ln.append(ln)
                        rows_sh.append(i)
            return pd.DataFrame(
                {
                    "ch": rows_ch,
                    "band": np.asarray(rows_band, np.int64),
                    "si": np.asarray(rows_i, np.int64),
                    "sj": np.asarray(rows_j, np.int64),
                    "p_name": rows_nm,
                    "ln": np.asarray(rows_ln, np.int64),
                    "shard": np.asarray(rows_sh, np.int64),
                }
            )

    pair_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])

    def pairs(g: pd.DataFrame) -> pa.Table:
        si = int(g["si"].iloc[0])
        sj = int(g["sj"].iloc[0])
        nm_ = g["p_name"].to_numpy(object)
        ln = g["ln"].to_numpy(np.int64)
        sh = g["shard"].to_numpy(np.int64)
        a_out = np.array([], dtype=object)
        b_out = np.array([], dtype=object)
        if si == sj:
            idx = np.flatnonzero(sh == si)
            ia = ib = np.array([], dtype=np.int64)
            if len(idx) >= 2:
                ia, ib = np.triu_indices(len(idx), k=1)
                ia, ib = idx[ia], idx[ib]
        else:
            ii = np.flatnonzero(sh == si)
            jj = np.flatnonzero(sh == sj)
            ia = np.repeat(ii, len(jj))
            ib = np.tile(jj, len(ii))
        if len(ia):
            keep = np.abs(ln[ia] - ln[ib]) <= max_len_diff
            ia, ib = ia[keep], ib[keep]
        if len(ia):
            # vectorized DuckDB JW pass (VERDICT r4 #4)
            hit = batch_jw(nm_[ia], nm_[ib]) >= threshold
            a_out, b_out = nm_[ia[hit]], nm_[ib[hit]]
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.string()), pa.array(b_out, pa.string())],
            schema=pair_schema,
        )

    cand = (
        nm.map_batches(Emit, batch_format="pandas", concurrency=(1, 4))
        .groupby(["ch", "band", "si", "sj"])
        .map_groups(pairs, batch_format="pandas")
    )
    return _distinct_name_pairs(cand)


# --- per-pair match explanation (Splink waterfall) ---------------------------

# ceiling for an infinite/huge likelihood ratio in micro-units (u = 0):
# mirrored verbatim by the SQL oracle's CASE WHEN den = 0 branch
EXPLAIN_WT_CAP = 10**15


def q_match_explain(sf_dir: str,
                    threshold: float = MATCH_JW_THRESHOLD,
                    size_tol: int = MATCH_SIZE_TOL):
    """Per-pair match EXPLANATION — Splink's waterfall chart as data: for
    every blocked pair, each comparison field's likelihood-ratio
    contribution under the Fellegi-Sunter model (m/u from
    ``q_match_weights``), quantized to floor micro-units so the output
    is integer-exact.  Two rows per pair:

        wt_micro = ⌊10⁶ · (m_f / u_f)⌋          if field f agrees
        wt_micro = ⌊10⁶ · (1−m_f) / (1−u_f)⌋    if it disagrees

    This is the reviewer-facing "WHY did these two records match" audit
    the decision rule (``q_match_classify``) compresses away.

    Scale shape: the pair stream is ``q_match_classify``'s own verified
    blocked comparison (chunked rectangular outer agreement, capped
    blocks); the explanation attach is a per-batch vectorized lookup of
    a FOUR-ENTRY broadcast table (2 fields × agree/disagree — the m/u
    table is field-dictionary-bounded), so explaining costs one
    flat-map over the pairs, no extra shuffle."""
    wts = q_match_weights(sf_dir, threshold, size_tol).to_pandas()
    w = {r.field: r for r in wts.itertuples()}
    B = int(w["name"].n_match)
    D = int(w["name"].n_nonmatch)

    def wt_micro(field: str, agree: int) -> int:
        a = int(w[field].n_match_agree)
        c = int(w[field].n_nonmatch_agree)
        num = (a if agree else B - a) * D
        den = (c if agree else D - c) * B
        if den == 0:
            # u = 0 (or 1-u = 0): infinite likelihood ratio. Cap at a
            # documented ceiling instead of dividing by zero — mirrored
            # by the oracle's CASE WHEN den = 0 branch. (match_classify
            # never divides; the ratio there stays a cross-multiply.)
            return EXPLAIN_WT_CAP
        return min(num * 1_000_000 // den, EXPLAIN_WT_CAP)

    table = {
        (f, ag): wt_micro(f, ag) for f in ("name", "size") for ag in (0, 1)
    }
    ref = broadcast(table)
    # hand the already-computed m/u table to the pair stream so the
    # estimation passes (pattern histogram + JW vocabulary matrix) run
    # ONCE per invocation, not twice
    pairs = q_match_classify(sf_dir, threshold, size_tol, weights=wts)

    class Explain:
        def __init__(self):
            self.t = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            pka = df["p_partkey_a"].to_numpy(np.int64)
            pkb = df["p_partkey_b"].to_numpy(np.int64)
            an = df["agree_name"].to_numpy(np.int64)
            asz = df["agree_size"].to_numpy(np.int64)
            t = self.t
            name_wt = np.where(an == 1, t[("name", 1)], t[("name", 0)])
            size_wt = np.where(asz == 1, t[("size", 1)], t[("size", 0)])
            return pd.DataFrame(
                {
                    "p_partkey_a": np.concatenate([pka, pka]),
                    "p_partkey_b": np.concatenate([pkb, pkb]),
                    "field": np.concatenate(
                        [np.full(n, "name", object),
                         np.full(n, "size", object)]
                    ),
                    "agree": np.concatenate([an, asz]),
                    "wt_micro": np.concatenate(
                        [name_wt, size_wt]
                    ).astype(np.int64),
                }
            )

    return pairs.map_batches(Explain, batch_format="pandas",
                             concurrency=(1, 4))


# --- Ditto-style pair serialization ------------------------------------------

def q_pair_serialize(sf_dir: str, block_cap: int = CLASSIFY_BLOCK_CAP):
    """Serialize every blocked candidate pair into the Ditto entity-
    matching prompt format (Li et al., VLDB'20: ``COL <attr> VAL <value>``
    per attribute, ``[SEP]`` between the two records) — the stage that
    turns the pair stream into LLM/cross-encoder INPUT TEXT, the modern
    replacement for hand-built comparison vectors (and the pair-level
    analogue of M22's prompt formatter,
    3rd Place/src/snomedctentitylinking.py:284-293).

    Pairs are the ``q_match_classify`` blocked population: same first
    name char + same brand, partkey-canonical a < b. Output:
    (p_partkey_a, p_partkey_b, pair_text).

    Scale shape: one ``groupby(block)`` over slim (pk, name, brand, size)
    rows; within a block the triangle is emitted by vectorized
    ``np.triu_indices`` fancy-indexing and ONE pandas str concat per
    block — no per-pair Python. Blocks are capped by the ``_cap_block``
    discipline (keep-lowest-id, logged drop; the oracle is uncapped, so
    a drop fails parity loudly rather than silently)."""
    from .dedup import _cap_block

    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_size"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        nm = df["p_name"].astype(str)
        return pd.DataFrame(
            {
                "ch": nm.str[:1],
                "brand": df["p_brand"].astype(str),
                "pk": df["p_partkey"].to_numpy(np.int64),
                "name": nm,
                "size": df["p_size"].to_numpy(np.int64),
            }
        )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["p_partkey_a", "p_partkey_b", "pair_text"]
        g = _cap_block(g, "pk", "pair_serialize", block_cap)
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {"p_partkey_a": pd.Series([], dtype=np.int64),
                 "p_partkey_b": pd.Series([], dtype=np.int64),
                 "pair_text": pd.Series([], dtype=object)})[cols]
        # canonical a < b by partkey: g is pk-sorted, triangle i < j
        rec = (
            "COL name VAL " + g["name"]
            + " COL brand VAL " + g["brand"]
            + " COL size VAL " + g["size"].astype(str)
        ).to_numpy()
        pk = g["pk"].to_numpy(np.int64)
        ii, jj = np.triu_indices(n, k=1)
        return pd.DataFrame(
            {
                "p_partkey_a": pk[ii],
                "p_partkey_b": pk[jj],
                "pair_text": pd.Series(rec[ii]) + " [SEP] " + pd.Series(rec[jj]),
            }
        )[cols]

    return (
        ds.map_batches(slim, batch_format="pandas")
        .groupby(["ch", "brand"])
        .map_groups(block_pairs, batch_format="pandas")
    )


# --- BFS hop depth from each cluster's canonical root ------------------------

BFS_DEPTH_BITS = 20  # low bits of the packed (root, depth) carrier


def q_bfs_depth(sf_dir: str, threshold: float = 0.8):
    """Per-node BFS HOP DISTANCE from its cluster's canonical root (the
    lexicographically smallest member) in the fuzzy-name match graph —
    the cluster-diagnostics primitive behind ``q_name_clusters``'s flat
    labels: depth says HOW a member joined (direct match vs a chain of
    weak bridges), which is what a reviewer inspecting an over-merged
    entity needs (depth ≥ 2 members are exactly the ``transitive_pairs``
    suspects).

    Distributed shape: min-relaxation over a PACKED int64 carrier
    ``root_id << 20 | depth``, so the lexicographic (root, depth) min is
    ONE integer min and the one-hop message is literally ``carrier + 1``
    — each round is one vectorized pass over the materialized edge
    Dataset folding per-node candidate minima via ``tree_to_pandas``
    (node-bounded), with the carrier array broadcast (the ``q_cc_pivot``
    round discipline). Rounds = graph eccentricity; the loop runs to
    fixpoint (carriers are monotone non-increasing ints, termination is
    guaranteed; fuzzy-name graphs have tiny diameters). Edges are the
    UNCAPPED fuzzy predicate (the cc_pivot contract — the sequential
    oracle brute-forces the same graph).

    Output: (p_name, root, depth) over the full name vocabulary
    (singletons at depth 0)."""
    name_arr, edges, _ids = _fuzzy_edge_graph(sf_dir, threshold)
    n = len(name_arr)
    # depth <= n-1 and root < n must BOTH fit the packed carrier: bounding
    # n by the depth field's width covers the root field a fortiori (a
    # depth at the field limit would otherwise carry into the root bits
    # and propagate silently-wrong minima)
    if n >= 1 << BFS_DEPTH_BITS:
        raise ValueError(
            f"name vocabulary ({n}) exceeds the packed-carrier depth field "
            f"(2^{BFS_DEPTH_BITS}); widen BFS_DEPTH_BITS for this corpus"
        )

    carrier = (np.arange(n, dtype=np.int64) << BFS_DEPTH_BITS)  # self@0

    def relax_partial(car_ref):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                     "cand": pd.Series([], dtype=np.int64)})
            car = ray.get(car_ref)
            u = df["u"].to_numpy(np.int64)
            v = df["v"].to_numpy(np.int64)
            g = pd.DataFrame(
                {"node": np.concatenate([v, u]),
                 "cand": np.concatenate([car[u] + 1, car[v] + 1])}
            )
            return g.groupby("node", as_index=False).agg(cand=("cand", "min"))
        return fn

    while True:
        car_ref = broadcast(carrier.copy())
        mn = tree_to_pandas(
            edges.map_batches(relax_partial(car_ref), batch_format="pandas"),
            lambda df: df.groupby("node", as_index=False).agg(
                cand=("cand", "min")),
        )
        new = carrier.copy()
        if len(mn):
            np.minimum.at(new, mn["node"].to_numpy(np.int64),
                          mn["cand"].to_numpy(np.int64))
        if np.array_equal(new, carrier):
            break
        carrier = new

    roots = carrier >> BFS_DEPTH_BITS
    depth = carrier & ((1 << BFS_DEPTH_BITS) - 1)
    out = pd.DataFrame(
        {
            "p_name": name_arr,
            "root": name_arr[roots],
            "depth": depth.astype(np.int64),
        }
    )
    return rd.from_pandas(out)


# --- weakest-link cluster audit ----------------------------------------------

def q_weakest_link(sf_dir: str, threshold: float = 0.8):
    """Per-cluster WEAKEST LINK: for every multi-member fuzzy-name
    cluster, the match edge with the LOWEST similarity — the merge a
    reviewer would undo first, and the natural complement of
    ``q_threshold_stability`` (which counts clusters across thresholds;
    this names the specific edge that breaks next). Scores are floor
    micro-units of the property-pinned JW kernel, so the argmin is exact
    in both engines.

    Output: (cluster_rep, name_a, name_b, jw_micro) — one row per
    cluster that has at least one edge; ties broken by
    (jw_micro, name_a, name_b) asc.

    Scale shape: labels from the distributed components pass
    (vocabulary-bounded rep map, the ``q_name_clusters`` discipline);
    the edge stream re-scores with the shared kernel and per-batch
    argmin partials fold through ``tree_to_pandas`` — the driver only
    ever sees one row per cluster per batch."""
    # labels AND scored edges come from the SAME uncapped graph (the
    # _fuzzy_edge_graph contract — review fix: mixing capped name_clusters
    # labels with uncapped edges would attribute an over-cap block's
    # surviving edges across two different clusters and diverge from the
    # oracle's full-predicate components; this also avoids paying the
    # fuzzy self-join twice)
    from ..stages.components import connected_components

    name_arr, edges, _ids = _fuzzy_edge_graph(sf_dir, threshold)
    name_ref = broadcast(name_arr)
    lab = connected_components(edges).to_pandas()  # <= names-with-an-edge
    # rep lookup as a dense int array (nodes are 0..n-1 rank ids): a
    # vectorized take, not a per-row Python dict probe
    rep_arr = np.arange(len(name_arr), dtype=np.int64)
    if len(lab):
        rep_arr[lab["node"].to_numpy(np.int64)] = lab["label"].to_numpy(np.int64)
    rep_ref = broadcast(rep_arr)

    scored = edges.map_batches(
        jw_micro_scorer(name_ref), batch_format="pandas"
    )

    def argmin_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["cluster_rep", "name_a", "name_b", "jw_micro"]
        if len(df) == 0:
            return pd.DataFrame(
                {"cluster_rep": pd.Series([], dtype=object),
                 "name_a": pd.Series([], dtype=object),
                 "name_b": pd.Series([], dtype=object),
                 "jw_micro": pd.Series([], dtype=np.int64)})[cols]
        rep = ray.get(rep_ref)
        nm = ray.get(name_ref)
        out = pd.DataFrame(
            {"cluster_rep": nm[rep[df["u"].to_numpy(np.int64)]],
             "name_a": df["name_a"].to_numpy(object),
             "name_b": df["name_b"].to_numpy(object),
             "jw_micro": df["jw_micro"].to_numpy(np.int64)}
        )
        # batch-local argmin per cluster (deterministic tie order)
        out = out.sort_values(["jw_micro", "name_a", "name_b"],
                              kind="mergesort")
        return out.drop_duplicates("cluster_rep")[cols]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "cluster_rep" not in df.columns:
            return pd.DataFrame(
                {"cluster_rep": pd.Series([], dtype=object),
                 "name_a": pd.Series([], dtype=object),
                 "name_b": pd.Series([], dtype=object),
                 "jw_micro": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["jw_micro", "name_a", "name_b"],
                            kind="mergesort")
        return df.drop_duplicates("cluster_rep")

    out = tree_to_pandas(
        scored.map_batches(argmin_partial, batch_format="pandas"), fold
    )
    out = fold(out).reset_index(drop=True)
    return rd.from_pandas(
        out[["cluster_rep", "name_a", "name_b", "jw_micro"]]
    )


# --- progressive (pay-as-you-go) resolution curve ----------------------------

PROGRESSIVE_STEP = 8


def q_progressive_er(sf_dir: str, threshold: float = 0.8,
                     step: int = PROGRESSIVE_STEP):
    """PROGRESSIVE entity resolution curve (Whang et al., VLDB'13
    pay-as-you-go ER): process candidate pairs best-first (highest
    similarity first) and report, at every comparison budget, how much
    resolution has happened — the chart that tells an operator "80% of
    the merges came from the first 20% of the comparisons, stop there".

    Output: (budget, n_merges, n_clusters) — after the first ``budget``
    pairs in (jw_micro desc, name_a, name_b) order, the cumulative
    union-find merge count and the resulting cluster count over the full
    name vocabulary; one row per ``step`` pairs plus the final partial
    step.

    Scale shape: pair generation + scoring is the distributed fuzzy
    blocking pass (uncapped, the _fuzzy_edge_graph contract); the replay
    itself is inherently SEQUENTIAL (each merge depends on every prior
    one), so it folds the vocabulary-bounded scored edge list on the
    driver — the same documented bound as name_clusters' rep attach and
    greedy_key_selection (loud ``FUZZY_GRAPH_NODE_MAX`` guard in the
    shared graph builder). Edge scoring is the ``JwMicroScorer``
    actor-pool batch kernel (DuckDB C++, VERDICT r4 #4), not a per-pair
    Python loop."""
    name_arr, edges, _ids = _fuzzy_edge_graph(sf_dir, threshold)
    n = len(name_arr)

    scored = edges.map_batches(
        jw_micro_scorer(broadcast(name_arr)), batch_format="pandas"
    ).to_pandas()
    # best-first order with the deterministic (name_a, name_b) tie
    scored = scored.rename(columns={"name_a": "na", "name_b": "nb"}) \
        .sort_values(["jw_micro", "na", "nb"],
                     ascending=[False, True, True], kind="mergesort")

    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = []
    merges = 0
    for i, (u, v) in enumerate(zip(scored["u"], scored["v"]), start=1):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            merges += 1
        if i % step == 0 or i == len(scored):
            rows.append((i, merges, n - merges))
    out = pd.DataFrame(rows, columns=["budget", "n_merges", "n_clusters"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return rd.from_pandas(out)


# --- strict two-hop reach ----------------------------------------------------

def q_two_hop_reach(sf_dir: str, threshold: float = 0.8):
    """Strict TWO-HOP reach per node of the fuzzy-name match graph: how
    many names are reachable in exactly two hops but NOT one (and are
    not the node itself) — the "how much would one more transitive step
    merge" audit that sits between direct pairs (one hop) and full
    connected components (closure): a large two-hop fringe around a
    node is precisely where over-merge risk concentrates
    (``q_predicted_links`` scores these candidates; this counts them).

    Output: (p_name, n_two_hop) for names with a non-empty strict
    two-hop fringe.

    Scale shape: the graph is the shared uncapped ``_fuzzy_edge_graph``
    (edges distributed); the closure step runs on the NAME-VOCABULARY
    adjacency — the same dictionary-bounded n×n boolean matrix the
    ``_jw_agree_matrix`` machinery already materializes for scoring —
    as one boolean matmul (A², mask A and I). Vocabulary-bounded by the
    same rationale as cc_pivot / name_clusters — but the matrix is n²
    BITS of driver memory, so it carries its own (much tighter) loud
    guard on top of the shared FUZZY_GRAPH_NODE_MAX."""
    name_arr, edges, _ids = _fuzzy_edge_graph(sf_dir, threshold)
    n = len(name_arr)
    if n > TWO_HOP_NODE_MAX:
        raise ValueError(
            f"q_two_hop_reach: {n} distinct names exceeds TWO_HOP_NODE_MAX "
            f"({TWO_HOP_NODE_MAX}); the dense n×n adjacency matmul is "
            "driver-resident by design — use q_predicted_links'"
            " streamed candidate scoring for open-world vocabularies"
        )
    e = edges.to_pandas()  # <= vocabulary-bounded edge list
    A = np.zeros((n, n), dtype=bool)
    if len(e):
        u = e["u"].to_numpy(np.int64)
        v = e["v"].to_numpy(np.int64)
        A[u, v] = True
        A[v, u] = True
    A2 = A @ A
    strict = A2 & ~A
    np.fill_diagonal(strict, False)
    counts = strict.sum(axis=1).astype(np.int64)
    m = counts > 0
    return rd.from_pandas(pd.DataFrame(
        {"p_name": name_arr[m], "n_two_hop": counts[m]}
    ))


# --- blocking-scheme comparison ----------------------------------------------

BLOCKING_SCHEMES = [
    ("ch_brand", ["ch", "p_brand"]),
    ("ch", ["ch"]),
    ("brand_size", ["p_brand", "p_size"]),
    ("size", ["p_size"]),
]


def q_blocking_compare(sf_dir: str):
    """Blocking-scheme SELECTION table: the reduction-ratio /
    pairs-completeness trade-off of several CANDIDATE schemes side by
    side (``q_blocking_metrics`` scores the production scheme; this is
    the step before it — which scheme to adopt). Ratios are floor
    micro-units so the comparison is exact in both engines.

    Output: (scheme, blocked_pairs, true_blocked_pairs, rr_micro,
    pc_micro) — one row per scheme.

    Scale shape: ONE ``grouped_sums`` count pass at the FINEST key
    (every scheme attribute × the truth attribute, all dictionary-
    bounded, so the count table is tiny at any corpus size); every
    scheme's blocked and true-blocked pair sums are marginal n(n−1)/2
    aggregations of that one table driver-side — candidate schemes cost
    no extra corpus passes."""
    ds = read(sf_dir, "part", ["p_name", "p_brand", "p_size", "p_type"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ch": df["p_name"].astype(str).str[:1],
                "p_brand": df["p_brand"].astype(str),
                "p_size": df["p_size"].to_numpy(np.int64),
                "p_type": df["p_type"].astype(str),
            }
        )

    fine = grouped_sums(
        ds.map_batches(slim, batch_format="pandas"),
        ["ch", "p_brand", "p_size", "p_type"],
        sums={},
        count_as="n",
    ).to_pandas()  # <= product of dictionary-bounded attribute vocabularies

    def pair_sum(df: pd.DataFrame, keys: list) -> int:
        g = df.groupby(keys)["n"].sum()
        return int((g * (g - 1) // 2).sum())

    n_total = int(fine["n"].sum())
    total_pairs = n_total * (n_total - 1) // 2
    tp = pair_sum(fine, ["p_type"])
    if total_pairs == 0 or tp == 0:
        # 0- or 1-row table, or no same-type pair: every ratio's
        # denominator vanishes — empty typed frame (ADVICE r4, the
        # dense_hourly/decile_lift empty-table discipline; explicit
        # Arrow schema so the empty block keeps its columns)
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 4,
            names=["scheme", "blocked_pairs", "true_blocked_pairs",
                   "rr_micro", "pc_micro"]))
    rows = []
    for name, keys in BLOCKING_SCHEMES:
        bp = pair_sum(fine, keys)
        tbp = pair_sum(fine, keys + ["p_type"])
        rows.append(
            (
                name,
                bp,
                tbp,
                (total_pairs - bp) * 1_000_000 // total_pairs,
                tbp * 1_000_000 // tp,
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["scheme", "blocked_pairs", "true_blocked_pairs",
                 "rr_micro", "pc_micro"],
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return rd.from_pandas(out)
