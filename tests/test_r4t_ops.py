"""Invariant tests for the r4t batch: executed key salting and the KMV
bottom-k distinct sketch."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_salted_pairs_equal_unsalted_pair_set():
    """The whole point: the triangle-distributed salted execution emits
    EXACTLY the unsalted blocked-fuzzy pair set.  The fuzzy side runs
    UNCAPPED (block_cap huge): salting REPLACES truncation, so the
    equality contract is against the full predicate, not the lossy
    capped one."""
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_fuzzy_name_pairs,
        q_salted_pairs,
    )

    a = q_salted_pairs(SF).to_pandas()
    b = q_fuzzy_name_pairs(SF, block_cap=1 << 62).to_pandas()
    sa = set(zip(a["name_a"], a["name_b"]))
    sb = set(zip(b["name_a"], b["name_b"]))
    assert sa == sb
    assert len(a) == len(sa)  # no duplicate emission survives


def test_salted_pairs_salting_actually_activates():
    """The default shard_cap must fan blocks out to s > 1 at the
    DRIVER-GATE scale (sf0.01, where the oracle compare runs) —
    otherwise the gate would be testing a degenerate no-salt path."""
    from snomed_ct_entity_linking_ray.pipelines.er import SALT_SHARD_CAP
    names = pd.read_parquet(
        "/root/testdata/sf0.01/part.parquet", columns=["p_name"]
    )["p_name"].drop_duplicates().astype(str)
    ln = names.str.len()
    blocks = pd.DataFrame(
        {"ch": pd.concat([names.str[:1]] * 2, ignore_index=True),
         "band": pd.concat([ln // 4, ln // 4 + 1], ignore_index=True)}
    ).groupby(["ch", "band"]).size()
    assert (np.ceil(blocks / SALT_SHARD_CAP) > 1).any()


def test_salted_pairs_tiny_shard_cap_still_exact():
    """Extreme fan-out (every shard a near-singleton) must not lose or
    duplicate pairs."""
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_fuzzy_name_pairs,
        q_salted_pairs,
    )

    a = q_salted_pairs(SF, shard_cap=2).to_pandas()
    b = q_fuzzy_name_pairs(SF, block_cap=1 << 62).to_pandas()
    assert set(zip(a["name_a"], a["name_b"])) == set(
        zip(b["name_a"], b["name_b"])
    )


def test_kmv_users_error_bounds_and_exact_below_k():
    from snomed_ct_entity_linking_ray.pipelines.relational import q_kmv_users

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    res = q_kmv_users(SF).to_pandas().set_index("event_type")["est_users"]
    assert set(res.index) == set(exact.index)
    for et, est in res.items():
        ex = exact[et]
        if ex < 64:
            # below k the sketch is exact (modulo 64-bit hash collisions,
            # absent at fixture scale)
            assert est == ex
        else:
            # KMV relative error ~ 1/sqrt(k-1) = 12.6%; allow 4 sigma
            assert abs(est - ex) <= ex * 0.5, (et, est, ex)


def test_kmv_merge_invariance():
    """k-smallest of a union == k-smallest of per-part k-smallest —
    the mergeability the distributed combine relies on."""
    from snomed_ct_entity_linking_ray.functions.sketches import splitmix64

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10**9, 5000).astype(np.int64)
    h = np.sort(np.unique(splitmix64(vals.view(np.uint64))))
    k = 64
    whole = h[:k]
    parts = np.array_split(splitmix64(vals.view(np.uint64)), 7)
    partials = [np.sort(np.unique(p))[:k] for p in parts]
    merged = np.sort(np.unique(np.concatenate(partials)))[:k]
    assert np.array_equal(whole, merged)
