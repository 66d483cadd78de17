"""ER blocking operators: invariants beyond the oracle-parity compare."""

from __future__ import annotations

import numpy as np
import pytest

from snomed_ct_entity_linking_ray.pipelines import er

SF = "/root/testdata/sf0.001"


def test_fuzzy_blocking_exactness():
    """The dual-band emission loses no pair admitted by the declared
    predicate: brute force over distinct names == pipeline output."""
    import duckdb
    from itertools import combinations

    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler

    names = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    exp = {
        (a, b)
        for a, b in combinations(names, 2)
        if a[0] == b[0] and abs(len(a) - len(b)) <= 3 and jaro_winkler(a, b) >= 0.8
    }
    got = er.q_fuzzy_name_pairs(SF).to_pandas()
    assert set(zip(got["name_a"], got["name_b"])) == exp
    # distinct pass leaves no duplicates
    assert not got.duplicated(["name_a", "name_b"]).any()


def test_fuzzy_block_cap_logged_drop():
    """Over-cap blocks truncate deterministically: capped output is a
    subset and each (char, band) block contributes at most C(cap,2)."""
    full = er.q_fuzzy_name_pairs(SF).to_pandas()
    capped = er.q_fuzzy_name_pairs(SF, block_cap=3).to_pandas()
    key = lambda df: set(zip(df["name_a"], df["name_b"]))
    assert key(capped) <= key(full)
    assert len(capped) < len(full)


def test_fuzzy_len_band_guard():
    with pytest.raises(ValueError, match="len_band"):
        er.q_fuzzy_name_pairs(SF, max_len_diff=4, len_band=4)


def test_snm_window_counts():
    """Every rank-adjacent pair within the window appears exactly once:
    pair count is sum_{g=1..w} (n - g) and gaps partition accordingly."""
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    w = 3
    got = er.q_sorted_neighborhood_pairs(SF, window=w).to_pandas()
    assert len(got) == sum(n - g for g in range(1, w + 1))
    vc = got["rank_gap"].value_counts()
    for g in range(1, w + 1):
        assert vc[g] == n - g
    assert not got.duplicated(["cust_a", "cust_b"]).any()


def test_snm_neighbors_are_rank_adjacent():
    """gap-1 pairs reproduce the exact sorted order of (acctbal, custkey)."""
    import duckdb

    df = duckdb.sql(
        f"SELECT c_custkey, c_acctbal FROM read_parquet('{SF}/customer.parquet') "
        "ORDER BY c_acctbal, c_custkey"
    ).df()
    order = df["c_custkey"].to_numpy(np.int64)
    got = er.q_sorted_neighborhood_pairs(SF).to_pandas()
    g1 = got[got["rank_gap"] == 1].sort_values("cust_a")
    exp = set(zip(order[:-1], order[1:]))
    assert set(zip(g1["cust_a"], g1["cust_b"])) == exp


def test_kmeans_invariants():
    """Integer k-means: every vector labeled once, ≤ k clusters,
    two-run determinism (the order-independence contract), and clusters
    are non-trivial (more than one distinct label on this fixture)."""
    import duckdb

    from snomed_ct_entity_linking_ray.pipelines import vectors

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    a = vectors.q_kmeans_clusters(SF).to_pandas().sort_values("vec_id")
    b = vectors.q_kmeans_clusters(SF).to_pandas().sort_values("vec_id")
    assert len(a) == n
    assert a["vec_id"].is_unique
    assert a["cluster"].between(0, 7).all()
    assert a["cluster"].nunique() > 1
    assert np.array_equal(a.to_numpy(), b.to_numpy())


def test_order_event_window_boundaries(tmp_path):
    """Half-open window semantics (t_lo exclusive, t_hi inclusive), users
    with zero events keep 0, and cross-user events never leak."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snomed_ct_entity_linking_ray.pipelines import relational as R

    d = str(tmp_path)
    base = np.datetime64("2020-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([10, 10, 99], pa.int64()),
            "o_orderdate": pa.array([base, base + 30 * day, base], pa.timestamp("us")),
        }),
        f"{d}/orders.parquet",
    )
    # events for user 10: at t0 (excluded), t0+7d exactly (included),
    # t0+7d+1us (excluded), and one for user 20 inside the window
    us = np.timedelta64(1, "us")
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [base, base + 7 * day, base + 7 * day + us, base + day],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([10, 10, 10, 20], pa.int64()),
        }),
        f"{d}/events.parquet",
    )
    got = (
        R.q_order_event_window(d)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert got["o_orderkey"].tolist() == [1, 2, 3]
    assert got["n_events"].tolist() == [1, 0, 0]


def test_pattern_counts_matches_naive_triu():
    """Chunked rectangular outer comparisons == naive full-triangle
    enumeration, across chunk boundaries (n straddling multiples of the
    chunk) and degenerate n."""
    rng = np.random.default_rng(7)
    old = er._PAIR_CHUNK
    er._PAIR_CHUNK = 8  # force many chunks on small n
    try:
        for n in [0, 1, 2, 7, 8, 9, 16, 33, 100]:
            v = 5
            mat = (rng.random((v, v)) < 0.4).astype(np.uint8)
            mat = np.maximum(mat, mat.T)
            np.fill_diagonal(mat, 1)
            nid = rng.integers(0, v, n)
            tcode = rng.integers(0, 3, n)
            sz = rng.integers(0, 10, n)
            got = er._pattern_counts(nid, tcode, sz, mat, size_tol=2)
            exp = np.zeros(8, dtype=np.int64)
            for i in range(n):
                for j in range(i + 1, n):
                    code = (
                        4 * int(mat[nid[i], nid[j]])
                        + 2 * int(tcode[i] == tcode[j])
                        + int(abs(int(sz[i]) - int(sz[j])) <= 2)
                    )
                    exp[code] += 1
            assert got.tolist() == exp.tolist(), n
    finally:
        er._PAIR_CHUNK = old


def test_golden_profile_mode_tiebreak():
    """Survivorship mode rule: most frequent event_type wins; exact count
    ties break to the lexicographically smallest type."""
    import pandas as pd

    got = er.q_golden_user_profile(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    c = ev.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    exp = (
        c.sort_values(["user_id", "n", "event_type"], ascending=[True, False, True])
        .drop_duplicates("user_id")
        .set_index("user_id")["event_type"]
    )
    got_map = got.set_index("user_id")["top_type"]
    assert got_map.sort_index().equals(exp.sort_index())
    assert len(got) == ev["user_id"].nunique()


def test_name_clusters_transitive_closure():
    """Cluster labels are the transitive closure of the fuzzy edges: every
    edge endpoint shares a rep, reps are cluster minima, singletons map to
    themselves, and every distinct name appears exactly once."""
    import duckdb

    got = er.q_name_clusters(SF).to_pandas()
    pairs = er.q_fuzzy_name_pairs(SF).to_pandas()
    rep = dict(zip(got["p_name"], got["cluster_rep"]))
    names = set(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    assert set(got["p_name"]) == names and len(got) == len(names)
    for a, b in zip(pairs["name_a"], pairs["name_b"]):
        assert rep[a] == rep[b], (a, b)
    # rep is a member of its own cluster and is the cluster minimum
    by_rep: dict = {}
    for n, r in rep.items():
        by_rep.setdefault(r, []).append(n)
    for r, members in by_rep.items():
        assert r == min(members)


def test_match_weights_closed_form_vs_histogram():
    """m/u rows are the exact closed form over the q_match_patterns
    histogram: counts reconcile bin-by-bin and the probabilities are the
    single-division ratios of those counts."""
    hist = er.q_match_patterns(SF).to_pandas()
    got = er.q_match_weights(SF).to_pandas().set_index("field")
    mt = hist["agree_type"].to_numpy(np.int64)
    n = hist["n_pairs"].to_numpy(np.int64)
    n_match, n_nonmatch = n[mt == 1].sum(), n[mt == 0].sum()
    for field in ("name", "size"):
        ag = hist[f"agree_{field}"].to_numpy(np.int64)
        row = got.loc[field]
        assert row["n_match"] == n_match
        assert row["n_nonmatch"] == n_nonmatch
        assert row["n_match_agree"] == n[(mt == 1) & (ag == 1)].sum()
        assert row["n_nonmatch_agree"] == n[(mt == 0) & (ag == 1)].sum()
        assert row["m"] == row["n_match_agree"] / row["n_match"]
        assert row["u"] == row["n_nonmatch_agree"] / row["n_nonmatch"]
        assert 0.0 <= row["m"] <= 1.0 and 0.0 <= row["u"] <= 1.0


def test_blocking_metrics_brute_force():
    """Every count equals the naive per-pair enumeration at sf0.001."""
    import pandas as pd
    from itertools import combinations

    part = pd.read_parquet(f"{SF}/part.parquet")
    rows = list(
        zip(part["p_name"].str[:1], part["p_brand"], part["p_type"])
    )
    blocked = true_p = true_blocked = 0
    for (c1, b1, t1), (c2, b2, t2) in combinations(rows, 2):
        same_block = (c1, b1) == (c2, b2)
        same_type = t1 == t2
        blocked += same_block
        true_p += same_type
        true_blocked += same_block and same_type
    got = er.q_blocking_metrics(SF).to_pandas().iloc[0]
    n = len(part)
    assert got["total_pairs"] == n * (n - 1) // 2
    assert got["blocked_pairs"] == blocked
    assert got["true_pairs"] == true_p
    assert got["true_blocked_pairs"] == true_blocked
    assert got["reduction_ratio"] == 1.0 - blocked / (n * (n - 1) // 2)
    assert got["pairs_completeness"] == true_blocked / true_p


def test_metablocking_composite_equals_naive_threshold():
    """The composite-blocking union reproduces the naive "agrees on >= 2 of
    3 keys" pair set with exact shared counts — i.e. the quadratically
    cheaper plan loses nothing."""
    import pandas as pd
    from itertools import combinations

    part = pd.read_parquet(f"{SF}/part.parquet")
    recs = list(
        zip(
            part["p_partkey"].astype(int),
            part["p_name"].str[:1],
            part["p_size"].astype(int),
            part["p_type"],
        )
    )
    exp = {}
    for (ka, ca, sa, ta), (kb, cb, sb, tb) in combinations(recs, 2):
        ns = (ca == cb) + (sa == sb) + (ta == tb)
        if ns >= 2:
            lo, hi = min(ka, kb), max(ka, kb)
            exp[(lo, hi)] = ns
    got = er.q_metablocking_pairs(SF).to_pandas()
    gmap = dict(zip(zip(got["pk_a"], got["pk_b"]), got["n_shared"]))
    assert gmap == exp


def test_match_roc_curve_invariants():
    """ROC sweep invariants: cumulative counts are non-increasing in the
    threshold, recall is 1.0 at threshold 0, tp+fn is constant (= total
    matches), and the quantized bins reconcile with the agreement
    histogram's name-agreement count at the 0.85 threshold bin."""
    got = er.q_match_roc(SF).to_pandas().sort_values("threshold")
    assert got["threshold"].iloc[0] == 0.0 and got["rec"].iloc[0] == 1.0
    assert (got["tp"].diff().dropna() <= 0).all()
    assert (got["fp"].diff().dropna() <= 0).all()
    total = got["tp"] + got["fn"]
    assert (total == total.iloc[0]).all()
    # bin >= 17 <=> jw >= 0.85 (17/20): tp+fp there == histogram agree_name
    hist = er.q_match_patterns(SF).to_pandas()
    n_agree = hist.loc[hist["agree_name"] == 1, "n_pairs"].sum()
    at = got[got["threshold"] == 0.85]
    assert len(at) == 1
    assert int(at["tp"].iloc[0] + at["fp"].iloc[0]) == int(n_agree)


def test_mutual_best_reciprocity_brute_force():
    """Mutual-best output == brute-force reciprocal argmax over the blocked
    candidate graph (best over ALL candidates, threshold applied to the
    surviving reciprocal pairs only)."""
    import duckdb
    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler

    names = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    best = {}
    for a in names:
        cands = [
            b for b in names
            if b != a and b[0] == a[0] and abs(len(a) - len(b)) <= 3
        ]
        if cands:
            # argmax jw, tie-break lexicographically smallest cand
            mx = max(jaro_winkler(a, b) for b in cands)
            best[a] = min(b for b in cands if jaro_winkler(a, b) == mx)
    exp = {
        (min(x, y), max(x, y))
        for x, y in best.items()
        if best.get(y) == x and jaro_winkler(x, y) >= er.MUTUAL_JW_THRESHOLD
    }
    got = er.q_mutual_best_pairs(SF).to_pandas()
    assert set(zip(got["name_a"], got["name_b"])) == exp


def test_pair_features_match_kernels():
    """Every feature column reproduces the pure-Python kernels on its pair;
    pairs are exactly the fuzzy blocking predicate (no JW filter)."""
    import duckdb
    from itertools import combinations

    from snomed_ct_entity_linking_ray.functions.similarity import (
        jaro_winkler,
        levenshtein,
    )

    names = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    exp_pairs = {
        (a, b)
        for a, b in combinations(names, 2)
        if a[0] == b[0] and abs(len(a) - len(b)) <= 3
    }
    got = er.q_pair_features(SF).to_pandas()
    assert set(zip(got["name_a"], got["name_b"])) == exp_pairs
    for r in got.itertuples():
        assert r.lev == levenshtein(r.name_a, r.name_b)
        assert r.jw_ubin == int(
            np.floor(jaro_winkler(r.name_a, r.name_b) * er.JW_UBIN_SCALE)
        )
        ta, tb = set(r.name_a.split(" ")), set(r.name_b.split(" "))
        assert r.tok_inter == len(ta & tb)
        assert r.tok_union == len(ta | tb)
        assert (r.len_a, r.len_b) == (len(r.name_a), len(r.name_b))


def test_phonetic_blocks_partition():
    """Every pair shares its block's Soundex code; pair count per code is
    exactly C(n_code, 2); pairs are unique and lexicographically ordered."""
    import duckdb
    from snomed_ct_entity_linking_ray.functions.similarity import soundex

    names = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    from collections import Counter

    sizes = Counter(soundex(n) for n in names)
    exp_n = sum(v * (v - 1) // 2 for v in sizes.values())
    got = er.q_phonetic_pairs(SF).to_pandas()
    assert len(got) == exp_n
    assert not got.duplicated(["name_a", "name_b"]).any()
    for r in got.itertuples():
        assert r.name_a < r.name_b
        assert soundex(r.name_a) == soundex(r.name_b) == r.code


def test_cluster_metrics_invariants():
    """tp ≤ min(pred, gold) pairs; P/R/F1 are the single-division closed
    forms of the exact integer counts; n_records equals the part rowcount."""
    import duckdb

    got = er.q_cluster_metrics(SF).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    n_rows = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/part.parquet')"
    ).fetchone()[0]
    assert r.n_records == n_rows
    assert 0 <= r.tp_pairs <= min(r.pred_pairs, r.gold_pairs)
    p = np.float64(r.tp_pairs) / np.float64(r.pred_pairs)
    q = np.float64(r.tp_pairs) / np.float64(r.gold_pairs)
    assert r.pairwise_precision == p and r.pairwise_recall == q
    assert r.pairwise_f1 == np.float64(2.0) * p * q / (p + q)


def test_canopy_assignment_is_rarest_token():
    """The canopy of every pair is a token of BOTH names, is each name's
    minimum-df token (ties lexicographic), and all pairs clear the JW
    threshold with name_a < name_b."""
    import duckdb
    from collections import Counter

    names = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    ]
    df = Counter()
    for n in names:
        for t in set(n.split(" ")):
            df[t] += 1

    def canopy_of(n: str) -> str:
        return min(set(n.split(" ")), key=lambda t: (df[t], t))

    got = er.q_canopy_pairs(SF).to_pandas()
    assert len(got) > 0
    for r in got.itertuples():
        assert r.name_a < r.name_b
        assert r.jw >= er.CANOPY_JW_THRESHOLD
        assert canopy_of(r.name_a) == canopy_of(r.name_b) == r.canopy


def test_link_increment_covers_every_new_record():
    """Exactly one output row per new record (p_partkey % 10 == 0);
    matched rows clear the threshold against a REAL base name; unmatched
    rows carry the ''/0.0 sentinel and genuinely have no blocked base
    match above threshold."""
    import duckdb
    from snomed_ct_entity_linking_ray.functions.similarity import jaro_winkler

    part = duckdb.sql(
        f"SELECT p_partkey, p_name FROM read_parquet('{SF}/part.parquet')"
    ).df()
    new = part[part.p_partkey % er.LINK_INC_MOD == 0]
    base = set(part[part.p_partkey % er.LINK_INC_MOD != 0].p_name)

    got = er.q_link_increment(SF).to_pandas()
    assert sorted(got.p_partkey) == sorted(new.p_partkey)
    for r in got.itertuples():
        if r.matched_name:
            assert r.matched_name in base
            assert r.jw == jaro_winkler(r.p_name, r.matched_name)
            assert r.jw >= er.LINK_INC_THRESHOLD
        else:
            assert r.jw == 0.0
            best = max(
                (
                    jaro_winkler(r.p_name, b)
                    for b in base
                    if b[0] == r.p_name[0]
                    and abs(len(b) - len(r.p_name)) <= 3
                ),
                default=0.0,
            )
            assert best < er.LINK_INC_THRESHOLD


def test_match_classify_decision_is_exact_fs_ratio():
    """Every pair's is_match equals the exact-rational FS likelihood-ratio
    test recomputed independently with fractions.Fraction from the
    match_weights counts; the decision is constant per agreement pattern."""
    from fractions import Fraction

    wts = er.q_match_weights(SF).to_pandas().set_index("field")
    B = int(wts.loc["name"].n_match)
    D = int(wts.loc["name"].n_nonmatch)

    def ratio(field: str, agree: int) -> Fraction:
        a = int(wts.loc[field].n_match_agree)
        c = int(wts.loc[field].n_nonmatch_agree)
        num = (a if agree else B - a) * D
        den = (c if agree else D - c) * B
        if den == 0:
            return Fraction(10**9) if num > 0 else Fraction(1)  # 0/0 → ≥1
        return Fraction(num, den)

    got = er.q_match_classify(SF).to_pandas()
    assert len(got) > 0
    per_pattern = got.groupby(["agree_name", "agree_size"])["is_match"].nunique()
    assert (per_pattern == 1).all()
    for r in got.drop_duplicates(["agree_name", "agree_size"]).itertuples():
        exp = int(ratio("name", r.agree_name) * ratio("size", r.agree_size) >= 1)
        assert r.is_match == exp
    assert not got.duplicated(["p_partkey_a", "p_partkey_b"]).any()
    assert (got.p_partkey_a < got.p_partkey_b).all()


def test_suffix_blocking_matches_naive():
    """Pair set equals the naive enumeration: two names pair iff they
    share a suffix of length ≥ min_len whose global block size is within
    [2, block_max]; pairs are canonical and unique."""
    import duckdb
    from collections import defaultdict
    from itertools import combinations

    names = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    blocks = defaultdict(set)
    for n in names:
        for i in range(len(n) - er.SUFFIX_MIN_LEN + 1):
            blocks[n[i:]].add(n)
    exp = set()
    for members in blocks.values():
        if 2 <= len(members) <= er.SUFFIX_BLOCK_MAX:
            for a, b in combinations(sorted(members), 2):
                exp.add((a, b))
    got = er.q_suffix_pairs(SF).to_pandas()
    assert not got.duplicated(["name_a", "name_b"]).any()
    assert set(zip(got.name_a, got.name_b)) == exp
