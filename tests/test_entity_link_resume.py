"""Flagship checkpointed-run resume semantics (FIXTURES.md resume tier):
resume must skip COMPUTE for finished partitions (extraction filtered out
at the read, link map loaded from its artifact, resolution skipped before
the transform), and resumed output must be byte-identical."""

from __future__ import annotations

import json
import os
import shutil

from snomed_ct_entity_linking_ray.pipelines import entity_link as el
from snomed_ct_entity_linking_ray.sources import checkpoint as cp

SF = "/root/testdata/sf0.001"


def test_checkpointed_flagship_resume(tmp_path):
    root = str(tmp_path / "ckpt")
    m1 = el.run_entity_link_checkpointed(SF, root)
    assert m1["partitions"] > 1
    assert m1["skipped_partitions"] == 0
    assert m1["rows"] > 0
    assert m1["mentions_stage"]["partitions"] == el.N_OUTPUT_PARTITIONS
    assert not m1["link_map_cached"]

    # stage summary carries lineage + metrics (north_rule)
    with open(os.path.join(root, "linked_mentions", "_STAGE.json")) as f:
        stage = json.load(f)
    assert "union_find" in stage["lineage"]["stages"]
    assert stage["metrics"]["rows"] == m1["rows"]

    # rerun: identical fingerprint → every stage fully skipped, including
    # COMPUTE (no buckets extracted, link map loaded from artifact)
    m2 = el.run_entity_link_checkpointed(SF, root)
    assert m2["skipped_partitions"] == m2["partitions"] == m1["partitions"]
    assert m2["rows"] == m1["rows"]
    assert m2["mentions_stage"]["partitions"] == 0  # zero buckets extracted
    assert (
        m2["mentions_stage"]["buckets_skipped_at_read"]
        == el.N_OUTPUT_PARTITIONS
    )
    assert m2["link_map_cached"]

    # read back matches a direct run
    back = cp.read_stage(root, "linked_mentions").to_pandas()
    direct = el.run_entity_link(SF).to_pandas()
    key = ["doc_id", "start", "end", "concept_id"]
    a = back[key].sort_values(key).reset_index(drop=True)
    b = direct[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_partial_resume_recomputes_only_missing(tmp_path):
    root = str(tmp_path / "ckpt")
    m1 = el.run_entity_link_checkpointed(SF, root)
    import pyarrow.parquet as pq

    before = {
        d: pq.read_table(
            os.path.join(root, "linked_mentions", d, "data.parquet")
        )
        for d in sorted(os.listdir(os.path.join(root, "linked_mentions")))
        if d.startswith("part=")
    }

    # simulate a crash that lost two output partitions and one mentions
    # partition (bucket 3: both stages; bucket 7: output only)
    shutil.rmtree(os.path.join(root, "mentions", "part=3"))
    shutil.rmtree(os.path.join(root, "linked_mentions", "part=3"))
    shutil.rmtree(os.path.join(root, "linked_mentions", "part=7"))

    m2 = el.run_entity_link_checkpointed(SF, root)
    # extraction reran for exactly the one missing mentions bucket
    assert m2["mentions_stage"]["partitions"] == 1
    assert (
        m2["mentions_stage"]["buckets_skipped_at_read"]
        == el.N_OUTPUT_PARTITIONS - 1
    )
    # link map came from the fingerprint-matched artifact, not recompute
    assert m2["link_map_cached"]
    # resolution recomputed only the two missing output partitions
    assert m2["partitions"] == el.N_OUTPUT_PARTITIONS
    assert m2["skipped_partitions"] == el.N_OUTPUT_PARTITIONS - 2
    assert m2["rows"] == m1["rows"]

    # byte-identical recovery of the lost partitions
    for d in ("part=3", "part=7"):
        after = pq.read_table(
            os.path.join(root, "linked_mentions", d, "data.parquet")
        )
        assert after.equals(before[d])


def test_fingerprint_invalidates_on_config_change(tmp_path):
    """exclude_sections is part of the fingerprint: re-running with a
    different section filter must NOT reuse stale partitions."""
    root = str(tmp_path / "ckpt")
    el.run_entity_link_checkpointed(SF, root)
    m2 = el.run_entity_link_checkpointed(
        SF, root, exclude_sections=frozenset({"Allergies"})
    )
    assert m2["skipped_partitions"] == 0
    assert not m2["link_map_cached"]
    back = cp.read_stage(root, "linked_mentions").to_pandas()
    direct = el.run_entity_link(
        SF, exclude_sections=frozenset({"Allergies"})
    ).to_pandas()
    key = ["doc_id", "start", "end", "concept_id"]
    a = back[key].sort_values(key).reset_index(drop=True)
    b = direct[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
