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
hash-partitioned joins per round plus label-of-label pointer jumping
(O(log diameter) rounds, nothing ever centralized; raises if the round
budget is exhausted before the fixpoint instead of returning silently
wrong labels). The fully-scalable path; higher fixed cost per round, so
the tree-reduce variant is preferred below ~10^8 nodes. BTS-style balanced
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
    root = min node id of the batch-local component. Node ids are remapped
    to dense indices (np.unique) so the union-find runs on flat int arrays
    with path-halving — no per-edge dict lookups."""
    uu = df["u"].to_numpy()
    vv = df["v"].to_numpy()
    nodes, inv = np.unique(np.concatenate([uu, vv]), return_inverse=True)
    ui = inv[: len(uu)]
    vi = inv[len(uu) :]
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(ui, vi):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by smaller ORIGINAL id so the final label is the min
            if nodes[ra] < nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([nodes[find(i)] for i in range(len(nodes))], dtype=np.int64)
    return pd.DataFrame({"u": nodes.astype(np.int64), "v": roots})


def connected_components(
    edges: rd.Dataset, fanin: int = 64, n_blocks_hint: int | None = None
) -> rd.Dataset:
    """edges(u:int64, v:int64) → labels(node:int64, label:int64).

    The whole reduction tree is built as ONE lazy chain (collapse →
    coalesce → collapse → … → single block) so it runs in a single
    streaming execution — per-round materialization only pays executor
    startup repeatedly. Round count comes from the input's block count
    (pass ``n_blocks_hint`` when the input is lazy)."""
    try:
        n = n_blocks_hint if n_blocks_hint is not None else edges.num_blocks()
    except Exception:
        n = 64
    cur = edges.map_batches(_collapse, batch_format="pandas")
    while n > 1:
        n = max(1, n // fanin)
        cur = cur.repartition(n).map_batches(_collapse, batch_format="pandas")
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

    converged = False
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
        stepped = (
            labels.union(lu).union(lv).groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        # pointer jumping (label-of-label): label values are themselves node
        # ids (each component's min node labels itself), so one self-join
        # halves the remaining path length — O(log diameter) total rounds
        # instead of O(diameter).
        jump = stepped.join(
            stepped.map_batches(
                lambda df: pd.DataFrame({"jnode": df["node"], "jlabel": df["label"]}),
                batch_format="pandas",
            ),
            join_type="inner", num_partitions=num_partitions,
            on=("label",), right_on=("jnode",),
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["node"], "label": df["jlabel"]}),
            batch_format="pandas",
        )
        new_labels = (
            stepped.union(jump).groupby("node")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        new_sum = new_labels.aggregate(Sum("label", alias_name="s"))["s"]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # exiting the loop without a fixpoint means labels may be WRONG
        # (components wider than the propagation horizon) — fail loudly
        # rather than return silently incorrect components.
        raise RuntimeError(
            f"connected_components_propagate did not converge within "
            f"{max_rounds} rounds; raise max_rounds (label sum still "
            f"changing: {prev_sum} -> {new_sum})"
        )
    return labels
