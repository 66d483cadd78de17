"""Flagship checkpointed-run resume semantics (FIXTURES.md resume tier)."""

from __future__ import annotations

import json
import os

from snomed_ct_entity_linking_ray.pipelines import entity_link as el
from snomed_ct_entity_linking_ray.sources import checkpoint as cp

SF = "/root/testdata/sf0.001"


def test_checkpointed_flagship_resume(tmp_path):
    root = str(tmp_path / "ckpt")
    m1 = el.run_entity_link_checkpointed(SF, root)
    assert m1["partitions"] > 1
    assert m1["skipped_partitions"] == 0
    assert m1["rows"] > 0

    # stage summary carries lineage + metrics (north_rule)
    with open(os.path.join(root, "linked_mentions", "_STAGE.json")) as f:
        stage = json.load(f)
    assert "union_find" in stage["lineage"]["stages"]
    assert stage["metrics"]["rows"] == m1["rows"]

    # rerun: identical fingerprint → all partitions skipped
    m2 = el.run_entity_link_checkpointed(SF, root)
    assert m2["skipped_partitions"] == m2["partitions"] == m1["partitions"]

    # read back matches a direct run
    back = cp.read_stage(root, "linked_mentions").to_pandas()
    direct = el.run_entity_link(SF).to_pandas()
    key = ["doc_id", "start", "end", "concept_id"]
    a = back[key].sort_values(key).reset_index(drop=True)
    b = direct[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
