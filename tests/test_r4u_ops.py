"""Invariant tests for the r4u batch: CDC merge apply and the
deterministic global shuffle index."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cdc_state_matches_sequential_log_replay():
    """Distributed keep-last + delete filter == replaying the whole
    change log in (ts, event_id) order into a dict."""
    from snomed_ct_entity_linking_ray.pipelines.relational import q_cdc_state

    res = q_cdc_state(SF).to_pandas().sort_values("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    state: dict = {}
    for r in ev.itertuples():
        if r.event_type == "error":
            state.pop(r.user_id, None)
        else:
            state[r.user_id] = (r.event_type,
                                int(np.rint(r.value * 100)))
    exp = pd.DataFrame(
        [(u, op, v) for u, (op, v) in sorted(state.items())],
        columns=["user_id", "op", "value_cents"],
    )
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), exp, check_dtype=False
    )


def test_cdc_state_deleted_users_absent():
    from snomed_ct_entity_linking_ray.pipelines.relational import q_cdc_state

    res = q_cdc_state(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    last = ev.sort_values(["ts", "event_id"]).drop_duplicates(
        subset=["user_id"], keep="last"
    )
    deleted = set(last[last["event_type"] == "error"]["user_id"])
    assert deleted.isdisjoint(set(res["user_id"]))
    assert set(res["user_id"]) | deleted == set(ev["user_id"])


def test_shuffle_index_is_a_permutation():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_shuffle_index,
    )

    res = q_shuffle_index(SF).to_pandas()
    n = len(res)
    assert sorted(res["shuffle_pos"]) == list(range(n))
    assert res["doc_id"].is_unique
    # rank order is exactly (rk, doc_id) ascending
    s = res.sort_values("shuffle_pos")
    key = list(zip(s["rk"], s["doc_id"]))
    assert key == sorted(key)


def test_shuffle_index_deterministic_across_runs():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_shuffle_index,
    )

    a = q_shuffle_index(SF).to_pandas().sort_values("doc_id")
    b = q_shuffle_index(SF).to_pandas().sort_values("doc_id")
    assert a["shuffle_pos"].tolist() == b["shuffle_pos"].tolist()
