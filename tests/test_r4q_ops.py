"""Invariant tests for the r4q operator batch — properties the oracle
compare can't see (brute-force equivalence on random inputs, structural
invariants of the outputs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_near_events_binary_search_matches_bruteforce():
    """The vectorized per-row-bounded binary search must equal the O(n²)
    definition on adversarial random data (many users, duplicate
    timestamps, interleaved segments)."""
    from snomed_ct_entity_linking_ray.pipelines.relational import q_near_events

    res = q_near_events(SF, window_s=3600).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    u = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    uid = ev["user_id"].to_numpy()
    eid = ev["event_id"].to_numpy()
    w = 3600 * 1_000_000
    expected = set()
    for i in range(len(ev)):
        for j in range(len(ev)):
            if uid[i] == uid[j] and 0 < u[j] - u[i] <= w:
                expected.add((int(eid[i]), int(eid[j]), int(u[j] - u[i])))
    got = set(
        zip(res["event_id_a"].astype(int), res["event_id_b"].astype(int),
            res["gap_us"].astype(int))
    )
    assert got == expected
    assert len(res) == len(expected)


def test_near_events_pairs_kernel_random():
    """Direct kernel check on synthetic bursts: one bucket frame with
    equal timestamps and tight clusters."""
    from snomed_ct_entity_linking_ray.pipelines import relational as R

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 12, n).astype(np.int64),
            "u": rng.randint(0, 5000, n).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    # brute force with window=1000 (gap units, not seconds — call the
    # inner kernel via the public query is not possible here, so
    # replicate its contract directly)
    w = 1000
    exp = set()
    for i in range(n):
        for j in range(n):
            if (
                df.user_id[i] == df.user_id[j]
                and 0 < df.u[j] - df.u[i] <= w
            ):
                exp.add((int(df.event_id[i]), int(df.event_id[j])))
    # run the same sorted-bucket kernel the operator uses
    g = df.copy()
    g["ts"] = pd.to_datetime(g.pop("u") * 1_000_000, unit="ns")
    # go through the full operator on a tmp parquet
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        g[["event_id", "user_id", "ts"]].to_parquet(
            os.path.join(td, "events.parquet")
        )
        res = R.q_near_events(td, window_s=0, n_buckets=4)
        # window_s=0 → no pairs (strict gap>0 and <=0 impossible)
        assert res.count() == 0
        res = R.q_near_events(
            td, window_s=1, n_buckets=4
        ).to_pandas()  # 1s window = 1000 of our ms-scaled units? no —
        # our u was scaled by 1e6 ns = 1ms units, so 1 s = 1000 units ✔
        got = set(zip(res["event_id_a"].astype(int),
                      res["event_id_b"].astype(int)))
    assert got == exp


def test_rule_cascade_invariants():
    """Every record's canon must share the record's winning rule key, the
    canon must be the group min, and rule 0 records map to themselves."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_rule_cascade

    res = q_rule_cascade(SF).to_pandas()
    part = pd.read_parquet(f"{SF}/part.parquet")
    m = res.merge(part, on="p_partkey")
    canon_attrs = part.set_index("p_partkey")
    for _, r in m.iterrows():
        c = canon_attrs.loc[r.canon]
        if r.rule == 0:
            assert r.canon == r.p_partkey
        elif r.rule == 1:
            assert (c.p_name, c.p_brand, c.p_size) == (
                r.p_name, r.p_brand, r.p_size)
        elif r.rule == 2:
            assert (c.p_name, c.p_brand) == (r.p_name, r.p_brand)
        else:
            assert c.p_name == r.p_name
        assert r.canon <= r.p_partkey or r.rule == 0


def test_unlinkables_partitions_the_vocabulary():
    """The histogram must cover every record exactly once and every bin
    must be -1 or in [0, 20)."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_unlinkables

    res = q_unlinkables(SF).to_pandas()
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_name"])
    assert int(res["n_records"].sum()) == len(part)
    assert int(res["n_names"].sum()) == part["p_name"].nunique()
    bins = res["score_bin"].to_numpy()
    assert ((bins == -1) | ((bins >= 0) & (bins < 20))).all()


def test_predicted_links_are_nonedges_with_common_neighbors():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_fuzzy_name_pairs,
        q_predicted_links,
    )

    pred = q_predicted_links(SF).to_pandas()
    edges = q_fuzzy_name_pairs(SF).to_pandas()
    eset = set(zip(edges["name_a"], edges["name_b"]))
    adj: dict[str, set] = {}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _, r in pred.iterrows():
        assert (r.name_a, r.name_b) not in eset
        cn = len(adj.get(r.name_a, set()) & adj.get(r.name_b, set()))
        assert cn == r.cn and cn >= 2


def test_threshold_stability_refines():
    """Raising the threshold can only split clusters: n_sub >= 1 and the
    sum of hi-cluster counts equals the number of distinct hi reps."""
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_name_clusters,
        q_threshold_stability,
    )

    st = q_threshold_stability(SF).to_pandas()
    assert (st["n_sub"] >= 1).all()
    hi = q_name_clusters(SF, threshold=0.9).to_pandas()
    assert int(st["n_sub"].sum()) == hi["cluster_rep"].nunique()
    assert int(st["n_names"].sum()) == len(hi)


def test_cosine_range_integer_contract():
    """Every returned sim must clear the threshold and equal the exact
    integer dot of the quantized normalized vectors."""
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        N_QUERIES,
        RANGE_QUANT,
        RANGE_TAU_Q12,
        q_cosine_range,
    )

    res = q_cosine_range(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    Ei = np.rint(E * RANGE_QUANT).astype(np.int64)
    byid = {int(v): Ei[i] for i, v in enumerate(emb["vec_id"])}
    assert (res["sim_q12"] >= RANGE_TAU_Q12).all()
    for _, r in res.iterrows():
        assert int(r.query_id) < N_QUERIES <= int(r.match_id)
        assert int(byid[int(r.query_id)] @ byid[int(r.match_id)]) == r.sim_q12


def test_mad_outliers_thresholds():
    """Outliers must satisfy |v - med| > 3*mad with med/mad constant per
    group, and no non-outlier row may satisfy it."""
    import duckdb

    from snomed_ct_entity_linking_ray.pipelines.relational import q_mad_outliers

    res = q_mad_outliers(SF).to_pandas()
    if len(res):
        d = np.abs(res["value_cents"] - res["med_cents"])
        assert (d > 3 * res["mad_cents"]).all()
        assert (res.groupby("event_type")[["med_cents", "mad_cents"]]
                .nunique() == 1).all().all()
    # completeness vs a direct single-process recount
    con = duckdb.connect()
    n = con.execute(f"""
        WITH v AS (SELECT event_type, CAST(round(value*100,0) AS BIGINT) v
                   FROM read_parquet('{SF}/events.parquet')),
        med AS (SELECT event_type,
                       percentile_disc(0.5) WITHIN GROUP (ORDER BY v) med
                FROM v GROUP BY 1),
        dev AS (SELECT v.event_type, abs(v.v - med.med) d
                FROM v JOIN med USING (event_type)),
        mad AS (SELECT event_type,
                       percentile_disc(0.5) WITHIN GROUP (ORDER BY d) mad
                FROM dev GROUP BY 1)
        SELECT count(*) FROM dev JOIN mad USING (event_type)
        WHERE dev.d > 3 * mad.mad
    """).fetchone()[0]
    assert len(res) == n


def test_media_dup_docs_group_structure():
    """Keeper must be the min doc_id of its group and group sizes must
    match member counts."""
    from snomed_ct_entity_linking_ray.pipelines.multimodal import q_media_dup_docs

    res = q_media_dup_docs(SF).to_pandas()
    if not len(res):
        pytest.skip("no media dup groups at this sf")
    g = res.groupby("keeper")
    for keeper, grp in g:
        assert grp["doc_id"].min() == keeper
        assert (grp["n_docs"] == len(grp)).all()
