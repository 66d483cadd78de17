"""Resume semantics (FIXTURES.md resume tier): partitioned writes with
manifests, skip-if-done, fingerprint invalidation, byte-identical re-runs."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from snomed_ct_entity_linking_ray.sources import checkpoint as cp


def _toy_ds():
    df = pd.DataFrame(
        {
            "bucket": [0, 0, 1, 1, 2],
            "doc_id": ["a", "b", "c", "d", "e"],
            "val": [1, 2, 3, 4, 5],
        }
    )
    return rd.from_pandas(df)


def test_checkpointed_write_and_resume(tmp_path):
    root = str(tmp_path / "ckpt")
    m1 = cp.checkpointed_write(_toy_ds(), root, "stage1", "bucket", "fp1")
    assert m1["partitions"] == 3 and m1["skipped_partitions"] == 0
    assert os.path.exists(f"{root}/stage1/part=0/_MANIFEST.json")
    assert os.path.exists(f"{root}/stage1/_STAGE.json")

    # second run with same fingerprint: all partitions skipped
    m2 = cp.checkpointed_write(_toy_ds(), root, "stage1", "bucket", "fp1")
    assert m2["skipped_partitions"] == 3

    # delete one partition: only it is rewritten
    shutil.rmtree(f"{root}/stage1/part=1")
    m3 = cp.checkpointed_write(_toy_ds(), root, "stage1", "bucket", "fp1")
    assert m3["skipped_partitions"] == 2

    # changed input fingerprint: everything recomputed
    m4 = cp.checkpointed_write(_toy_ds(), root, "stage1", "bucket", "fp2")
    assert m4["skipped_partitions"] == 0

    # read back: identical content
    out = cp.read_stage(root, "stage1").to_pandas().sort_values("doc_id")
    assert out["val"].tolist() == [1, 2, 3, 4, 5]


def test_rerun_byte_identical(tmp_path):
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    cp.checkpointed_write(_toy_ds(), root_a, "s", "bucket", "fp")
    cp.checkpointed_write(_toy_ds(), root_b, "s", "bucket", "fp")
    for part in ["part=0", "part=1", "part=2"]:
        ta = pq.read_table(f"{root_a}/s/{part}/data.parquet")
        tb = pq.read_table(f"{root_b}/s/{part}/data.parquet")
        # same logical content, deterministically ordered within partition
        assert ta.sort_by("doc_id").equals(tb.sort_by("doc_id"))


def test_manifest_contents(tmp_path):
    root = str(tmp_path / "ckpt")
    cp.checkpointed_write(_toy_ds(), root, "s", "bucket", "fpX", lineage={"src": "toy"})
    with open(f"{root}/s/part=0/_MANIFEST.json") as f:
        m = json.load(f)
    assert m["input_fingerprint"] == "fpX" and m["rows"] == 2
    with open(f"{root}/s/_STAGE.json") as f:
        s = json.load(f)
    assert s["lineage"] == {"src": "toy"} and s["metrics"]["rows"] == 5
