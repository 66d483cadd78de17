"""Round-5 fixes: VERDICT r4 #4/#5/#7 and the ADVICE r4 low items.

Each test pins a previously-admitted divergence or crash on exactly the
input class the advice named — synthetic parquet dirs under /tmp, never
the driver testdata."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name: str, df: pd.DataFrame, schema: pa.Schema | None = None):
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(t, os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


EVENT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


def _events_frame(types, props):
    n = len(types)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="h"),
            "user_id": np.arange(n, dtype=np.int64) % 7,
            "event_type": types,
            "value": np.linspace(1.0, 2.0, n),
            "props": props,
        }
    )


def test_json_field_sum_all_missing_group_matches_oracle(tmp_path):
    """VERDICT r4 #4: a group whose rows ALL lack 'k' — the exact case the
    old docstring admitted as a divergence (Ray 0 vs SQL NULL). The oracle
    now COALESCEs; both engines must agree on it."""
    import __ray_entry__ as entry
    from snomed_ct_entity_linking_ray.pipelines.relational import q_json_field_sum

    df = _events_frame(
        types=["buy", "buy", "view", "view", "view"],
        props=['{"k": 3}', '{"k": -2}', '{"x": 1}', "{}", '{"y": 9}'],
    )
    sf = _write(tmp_path, "events", df, EVENT_SCHEMA)

    got = (
        q_json_field_sum(sf)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["json_field_sum"])
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got.columns.tolist() == [c for c in got.columns]
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # the all-missing group really is present and really sums to 0
    assert int(got.set_index("event_type").loc["view", "sum_k"]) == 0


def test_quantile_sketch_bitlength_exact_above_2_53():
    """ADVICE r4: np.frexp alone rounds 2^54-1 up to 2^54 (bit 55);
    the shift-compare correction must restore the exact integer
    bit_length across the int64 range."""
    vals = np.array(
        [0, 1, 2, 3, (1 << 53) - 1, (1 << 53) + 1, (1 << 54) - 1,
         (1 << 60) - 1, (1 << 62) - 1, (1 << 62)],
        dtype=np.int64,
    )
    # replicate the q_quantile_sketch prep kernel's bin math on raw cents
    cp = np.maximum(vals, 0)
    e = np.frexp(cp.astype(np.float64))[1].astype(np.int64)
    e = np.minimum(e, 63)
    eh = np.maximum(e - 1, 0)
    e = e - (cp < (np.int64(1) << eh)).astype(np.int64)
    got = np.where(vals <= 0, 0, e)
    want = np.array([0 if v <= 0 else int(v).bit_length() for v in vals],
                    dtype=np.int64)
    np.testing.assert_array_equal(got, want)
    # and the old frexp-only path really was wrong on the advice's case
    assert int(np.frexp(float((1 << 54) - 1))[1]) != (int((1 << 54) - 1)).bit_length()


def test_type_cooccurrence_raises_past_63_types(tmp_path):
    """ADVICE r4: >63 distinct event types must raise (mask overflow +
    2^|types| histogram state), mirroring the BFS_DEPTH_BITS guard."""
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_type_cooccurrence,
    )

    types = [f"t{i:03d}" for i in range(64)]
    df = _events_frame(types=types, props=["{}"] * 64)
    sf = _write(tmp_path, "events", df, EVENT_SCHEMA)
    with pytest.raises(ValueError, match="63-bit"):
        q_type_cooccurrence(sf)


def test_blocking_compare_single_row_table(tmp_path):
    """ADVICE r4: a part table with one row has zero total pairs — empty
    typed frame, not ZeroDivisionError."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_blocking_compare

    part = pd.DataFrame(
        {
            "p_partkey": np.array([1], dtype=np.int64),
            "p_name": ["lonely widget"],
            "p_brand": ["BrandA"],
            "p_type": ["small"],
            "p_size": np.array([3], dtype=np.int32),
            "p_retailprice": [10.0],
        }
    )
    sf = _write(tmp_path, "part", part)
    out = q_blocking_compare(sf)
    assert out.count() == 0
    # (ray to_pandas drops columns on zero-row data; the Dataset schema is
    # the contract surface)
    assert out.schema().names == [
        "scheme", "blocked_pairs", "true_blocked_pairs", "rr_micro", "pc_micro",
    ]


def test_kcenter_coreset_fewer_vectors_than_k(tmp_path):
    """ADVICE r4: with 3 vectors and k=8 the traversal must emit the 3
    available centers instead of IndexError."""
    from snomed_ct_entity_linking_ray.pipelines.vectors import q_kcenter_coreset

    rng = np.random.default_rng(7)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(3, dtype=np.int64),
            "embedding": [rng.standard_normal(8).astype(np.float32)
                          for _ in range(3)],
            "label": np.zeros(3, dtype=np.int32),
        }
    )
    sf = _write(tmp_path, "embeddings", emb)
    out = q_kcenter_coreset(sf, k=8).to_pandas()
    assert len(out) == 3
    assert sorted(out["vec_id"].tolist()) == [0, 1, 2]
    assert out["pick_order"].tolist() == [0, 1, 2]


def test_batch_jw_matches_python_kernel():
    """VERDICT r4 #4: the vectorized DuckDB batch kernel used by the
    blocked-verification stages must agree bit-exactly with the scalar
    Python jaro_winkler on arbitrary pairs (including the prefix-bonus
    and short-string edge cases)."""
    from snomed_ct_entity_linking_ray.functions.similarity import (
        batch_jw,
        jaro_winkler,
    )

    rng = np.random.default_rng(11)
    alpha = np.array(list("abcdefgh"))
    pairs = []
    for _ in range(200):
        la, lb = int(rng.integers(0, 9)), int(rng.integers(0, 9))
        pairs.append(("".join(rng.choice(alpha, la)),
                      "".join(rng.choice(alpha, lb))))
    # ("", "") excluded: the one documented divergence (Python 1.0 vs
    # DuckDB 0.0) — unreachable in the distinct-name verification stages
    pairs += [("a", ""), ("abc", "abc"), ("martha", "marhta"),
              ("dwayne", "duane"), ("ab", "ba")]
    pairs = [p for p in pairs if p != ("", "")]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = batch_jw(a, b)
    want = np.array([jaro_winkler(x, y) for x, y in pairs])
    np.testing.assert_array_equal(got, want)


def test_edges_from_pairs_join_path_matches_broadcast(ray_session):
    """The dual-plan id attach (VERDICT r4 #3): the hash-join path that
    activates above IDMAP_BROADCAST_MAX names must produce exactly the
    broadcast path's edge set."""
    import snomed_ct_entity_linking_ray.pipelines.er as er

    sf = "/root/testdata/sf0.001"
    ids, n = er._ranked_name_ids(sf)
    pairs = er.q_fuzzy_name_pairs(sf, threshold=0.8, block_cap=1 << 62)
    e1 = er._edges_from_pairs(pairs, ids, n).to_pandas()
    old = er.IDMAP_BROADCAST_MAX
    er.IDMAP_BROADCAST_MAX = 0
    try:
        e2 = er._edges_from_pairs(pairs, ids, n).to_pandas()
    finally:
        er.IDMAP_BROADCAST_MAX = old
    k1 = sorted(map(tuple, e1[["u", "v"]].to_numpy()))
    k2 = sorted(map(tuple, e2[["u", "v"]].to_numpy()))
    assert len(k1) > 0
    assert k1 == k2


def test_ranked_name_ids_are_dense_lexicographic(ray_session):
    """Distributed rank ids == sorted-order ids (the contract every
    fuzzy-graph consumer's determinism rests on)."""
    import duckdb

    import snomed_ct_entity_linking_ray.pipelines.er as er

    sf = "/root/testdata/sf0.001"
    ids, n = er._ranked_name_ids(sf)
    got = ids.to_pandas().sort_values("nid").reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(
        f"SELECT DISTINCT p_name FROM read_parquet('{sf}/part.parquet') "
        "ORDER BY p_name"
    ).df()
    assert n == len(want) == len(got)
    assert got["nid"].tolist() == list(range(n))
    assert got["p_name"].tolist() == want["p_name"].tolist()


def test_joinsafe_ray_version_pin():
    """VERDICT r4 #7: the planner patch must assert the Ray version it was
    validated on; the running version is pinned, so the import succeeds —
    and the pin list actually contains the running version."""
    import ray

    from snomed_ct_entity_linking_ray.stages import joinsafe

    assert ray.__version__ in joinsafe._TESTED_RAY_VERSIONS
