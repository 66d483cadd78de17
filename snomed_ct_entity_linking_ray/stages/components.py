"""Distributed connected components over an edge Dataset (SURVEY.md §7 step 7).

Two strategies, both deterministic (component label = min node id):

``connected_components`` (default) — **tree-reduce union-find**: each round
runs a per-block union-find that collapses its edges to ``(node, root)``
pairs (a map-side combine: output is O(#distinct nodes in block), far
smaller than the edge list), then coalesces blocks ~8× and collapses again.
``(node, root)`` pairs are themselves edges, so repeated collapse computes
the transitive closure exactly; the final round runs in ONE Ray task that
only ever sees the collapsed pair set. Rounds = O(log_8 #blocks); per round
one narrow repartition — no joins, no per-group UDFs. Scales while the
distinct-node set fits one worker (~10^8 nodes); beyond that use the
propagation variant.

``connected_components_propagate`` — hash-to-min label propagation with
hash-partitioned joins per round (O(diameter) rounds, nothing ever
centralized). The fully-scalable path; higher fixed cost per round, so the
tree-reduce variant is preferred below ~10^8 nodes. BTS-style balanced
trees (PAPERS.md, ICDE 2024) are the upgrade path for skewed high-degree
components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Min, Sum


def _collapse(df: pd.DataFrame) -> pd.DataFrame:
    """Union-find within one batch of (u,v) pairs → (u=node, v=root) pairs,
    root = min node id of the batch-local component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(df["u"].to_numpy(), df["v"].to_numpy()):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = np.unique(np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]))
    roots = np.array([find(int(n)) for n in nodes], dtype=np.int64)
    return pd.DataFrame({"u": nodes.astype(np.int64), "v": roots})


def connected_components(edges: rd.Dataset, fanin: int = 64) -> rd.Dataset:
    """edges(u:int64, v:int64) → labels(node:int64, label:int64)."""
    cur = edges.map_batches(_collapse, batch_format="pandas").materialize()
    while cur.num_blocks() > 1:
        n_next = max(1, cur.num_blocks() // fanin)
        cur = (
            cur.repartition(n_next)
            .map_batches(_collapse, batch_format="pandas")
            .materialize()
        )
    return cur.map_batches(
        lambda df: pd.DataFrame({"node": df["u"], "label": df["v"]}),
        batch_format="pandas",
    )


def connected_components_propagate(
    edges: rd.Dataset,
    max_rounds: int = 15,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Min-label propagation via hash joins; O(diameter) rounds. See module
    docstring — the beyond-single-worker-node-set path."""
    labels = (
        edges.map_batches(_collapse, batch_format="pandas")
        .map_batches(
            lambda df: pd.DataFrame({"node": df["u"], "label": df["v"]}),
            batch_format="pandas",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    ).materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    for _round in range(max_rounds):
        lu = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("u",), right_on=("node",),
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["v"], "label": df["label"]}),
            batch_format="pandas",
        )
        lv = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("v",), right_on=("node",),
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["u"], "label": df["label"]}),
            batch_format="pandas",
        )
        new_labels = (
            labels.union(lu).union(lv).groupby("node")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        new_sum = new_labels.aggregate(Sum("label", alias_name="s"))["s"]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
