"""Regression tests for the r4w review fixes: sentinel leakage in the
kNN-family top-k, cc_pivot's deterministic-order round cap, and
truth_discovery's sign/whitespace-tolerant claim parsing."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_embeddings(tmp_path, labels):
    rng = np.random.RandomState(11)
    n = len(labels)
    emb = rng.randn(n, 8).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(map(float, e)) for e in emb],
                                      pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    return str(tmp_path)


def test_hard_negatives_label_skew_emits_only_valid(tmp_path):
    """One label covers all but 2 vectors: those 2 are each other's only
    negatives of the big class, and each small-class vector has plenty.
    No sentinel (same-label or self) row may appear, and rows with
    fewer than k valid negatives emit exactly that many."""
    from snomed_ct_entity_linking_ray.oracles import _hard_negatives
    from snomed_ct_entity_linking_ray.pipelines.vectors import (
        q_hard_negatives,
    )

    sf = _write_embeddings(tmp_path, [0] * 8 + [1, 1])
    res = q_hard_negatives(sf, k=3).to_pandas().sort_values(
        ["vec_id", "rank"]).reset_index(drop=True)
    # big-class rows (label 0) have only 2 valid negatives < k=3
    per = res.groupby("vec_id").size()
    for vid in range(8):
        assert per[vid] == 2, (vid, per[vid])
    for vid in (8, 9):
        assert per[vid] == 3
    # engine == single-process oracle on the same crafted table
    exp = _hard_negatives(sf, k=3).to_pandas()
    pd.testing.assert_frame_equal(
        res,
        exp.sort_values(["vec_id", "rank"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_knn_join_corpus_smaller_than_k(tmp_path):
    """3 vectors with k=3: only 2 real neighbors each — no sentinel
    rows."""
    from snomed_ct_entity_linking_ray.pipelines.vectors import q_knn_join

    sf = _write_embeddings(tmp_path, [0, 1, 2])
    res = q_knn_join(sf, k=3).to_pandas()
    assert (res.groupby("vec_id").size() == 2).all()
    assert (res["vec_id"] != res["nn_id"]).all()


def test_cc_pivot_round_cap_falls_back_to_sequential():
    """max_rounds=1 forces the residual sequential completion; the
    output must equal the unconstrained run (and the sequential
    definition)."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_cc_pivot

    a = q_cc_pivot(SF).to_pandas().sort_values("p_name")
    b = q_cc_pivot(SF, max_rounds=1).to_pandas().sort_values("p_name")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_truth_discovery_negative_and_spaced_k(tmp_path):
    """Claims with negative k and whitespace before the colon must parse
    like the DuckDB oracle (json_extract + TRUNCATING // 10)."""
    import duckdb

    import __ray_entry__ as entry
    from snomed_ct_entity_linking_ray.pipelines.er import q_truth_discovery

    rows = []
    eid = 0
    base = np.datetime64("2026-01-01T00:00:00", "us")
    for uid in range(6):
        for j, src in enumerate(["click", "view", "error"]):
            k = [-5, -15, 87][(uid + j) % 3]
            sep = '"k" : ' if (uid + j) % 2 else '"k": '
            rows.append(
                (eid, base + np.timedelta64(eid, "s"), uid, src,
                 1.0, "{%s%d}" % (sep, k))
            )
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )
    ev.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    res = q_truth_discovery(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.execute(entry.oracle_sql()["truth_discovery"]).df()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = norm(res), norm(exp)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_match_explain_weight_cap_constant_is_mirrored():
    """The engine cap constant must equal the literal baked into the SQL
    oracle (the den=0 / LEAST branch)."""
    import __ray_entry__ as entry
    from snomed_ct_entity_linking_ray.pipelines.er import EXPLAIN_WT_CAP

    sql = entry.oracle_sql()["match_explain"]
    assert str(EXPLAIN_WT_CAP) == "1000000000000000"
    assert sql.count("1000000000000000") == 4
