"""Source-format dispatch tests: the same documents table must read
identically through Parquet, JSONL and CSV (flat), and the nested
interleaved spans schema must round-trip through JSONL."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq

from snomed_ct_entity_linking_ray.sources.docs_io import read_docs

SF = "/root/testdata/sf0.001"


def _flat_docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet").sort_values(
        "doc_id"
    ).reset_index(drop=True)


def test_jsonl_flat_roundtrip(tmp_path):
    df = _flat_docs()
    p = os.path.join(tmp_path, "docs.jsonl")
    df.to_json(p, orient="records", lines=True)
    got = (
        read_docs(p).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], df[sorted(df.columns)], check_like=True
    )


def test_jsonl_column_projection(tmp_path):
    df = _flat_docs()
    p = os.path.join(tmp_path, "docs.jsonl")
    df.to_json(p, orient="records", lines=True)
    got = read_docs(p, columns=["doc_id", "lang"]).to_pandas()
    assert sorted(got.columns) == ["doc_id", "lang"]
    assert len(got) == len(df)


def test_csv_flat_roundtrip(tmp_path):
    df = _flat_docs()
    p = os.path.join(tmp_path, "docs.csv")
    df.to_csv(p, index=False)
    got = (
        read_docs(p, columns=["doc_id", "n_chars"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == df["doc_id"].tolist()
    assert got["n_chars"].tolist() == df["n_chars"].tolist()


def test_jsonl_nested_spans_roundtrip(tmp_path):
    """The interleaved payload (list<struct> spans) must survive a JSONL
    round-trip: flatten_batch over the JSONL read equals flatten_batch
    over the Parquet read of the SAME fixture docs."""
    from snomed_ct_entity_linking_ray.fixtures import (
        fixture_dir,
        spec_for_sf_dir,
    )

    fdir = fixture_dir(spec_for_sf_dir(SF))
    src = os.path.join(fdir, "docs.parquet")
    tbl = pq.read_table(src)
    rows = tbl.to_pylist()
    p = os.path.join(tmp_path, "docs.jsonl")
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    a = read_docs(p).to_pandas()
    b = read_docs(src).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # span sequences compare structurally (list-of-dict equality)
    for x, y in zip(a["spans"], b["spans"]):
        lx = [dict(s) for s in x]
        ly = [dict(s) for s in y]
        assert len(lx) == len(ly)
        for sx, sy in zip(lx, ly):
            assert set(sx) == set(sy)
            for k in sx:
                assert sx[k] == sy[k], (k, sx, sy)
