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
from ray.data.aggregate import Sum


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


_PB = np.uint64(0x9E3779B97F4A7C15)


def _min_by_node(ds: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """(node, label)* → per-node min label, via hash-bucketed map_groups
    with a VECTORIZED pandas min inside each bucket (no per-group Python,
    no joins — the same shuffle discipline as pipelines/common.grouped_sums;
    bucket count is independent of node cardinality)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["label"].min()  # map-side combine
        g["_pb"] = (
            (g["node"].to_numpy(np.uint64) * _PB) % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["label"].min()

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_min, batch_format="pandas")
    )


def connected_components_propagate(
    edges: rd.Dataset,
    max_rounds: int = 15,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Hash-to-min label propagation; O(log diameter) rounds with pointer
    jumping. See module docstring — the beyond-single-worker-node-set path.

    JOIN-FREE: label lookups are expressed as union + groupby co-location
    (key rows and request rows meet in one group), because per-round hash
    joins spawn actor-pool aggregators that can starve a small CPU budget
    and re-execute the lazy edge lineage every round. Every shuffle here is
    a plain sort exchange over int64 keys; the exploded edge list is
    materialized ONCE and reused by all rounds.

    ``num_partitions`` doubles as the hash-bucket count of every grouped
    min — size it to the cluster (more buckets than cores wastes per-task
    fixed cost; the per-bucket work is vectorized C either way).

    CONTRACT: node ids must be NON-NEGATIVE int64 — ``-1`` is the internal
    label-carrier sentinel and ``np.iinfo.max`` the no-label marker, so a
    negative id would be silently mis-propagated. Enforced with a
    vectorized check at the edge explode (ADVICE r2)."""
    # (key, other) in both directions — materialized once, reused per round
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        if len(u) and (u.min() < 0 or v.min() < 0):
            raise ValueError(
                "connected_components_propagate requires non-negative node "
                "ids (-1 is the internal label-carrier sentinel)"
            )
        return pd.DataFrame(
            {"key": np.concatenate([u, v]), "other": np.concatenate([v, u])}
        )

    e2 = edges.map_batches(explode, batch_format="pandas").materialize()

    labels = _min_by_node(
        edges.map_batches(_collapse, batch_format="pandas").map_batches(
            lambda df: pd.DataFrame({"node": df["u"], "label": df["v"]}),
            batch_format="pandas",
        ),
        n_buckets=num_partitions,
    ).repartition(num_partitions).materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def as_messages(df: pd.DataFrame) -> pd.DataFrame:
        # label rows enter the edge groupby as (key=node, other=-1) carriers
        return pd.DataFrame(
            {
                "key": df["node"].to_numpy(np.int64),
                "other": np.full(len(df), -1, dtype=np.int64),
                "label": df["label"].to_numpy(np.int64),
            }
        )

    def add_label_col(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["label"] = np.int64(np.iinfo(np.int64).max)
        return df

    def add_kbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kb"] = (
            (df["key"].to_numpy(np.uint64) * _PB) % np.uint64(num_partitions)
        ).astype(np.int64)
        return df

    def bucket_propagate(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a key land in one bucket; per-key min label via a
        # VECTORIZED transform, pushed to every neighbor and kept for the
        # key itself — no per-key Python (bucket count is fixed)
        lab = g.groupby("key")["label"].transform("min").to_numpy(np.int64)
        other = g["other"].to_numpy(np.int64)
        m = other >= 0
        km = g.assign(label=lab).groupby("key", as_index=False)["label"].min()
        return pd.DataFrame(
            {
                "node": np.concatenate([other[m], km["key"].to_numpy(np.int64)]),
                "label": np.concatenate([lab[m], km["label"].to_numpy(np.int64)]),
            }
        )

    converged = False
    for _round in range(max_rounds):
        mixed = e2.map_batches(add_label_col, batch_format="pandas").union(
            labels.map_batches(as_messages, batch_format="pandas")
        )
        stepped = _min_by_node(
            mixed.map_batches(add_kbucket, batch_format="pandas")
            .groupby("_kb")
            .map_groups(bucket_propagate, batch_format="pandas"),
            n_buckets=num_partitions,
            # pin the block count: union+sort otherwise grow blocks every
            # round, doubling task counts (measured 2x wall per round)
        ).repartition(num_partitions).materialize()

        # pointer jumping (label-of-label): labels are node ids, so routing
        # (key=label, request node) next to (key=node, its label) in one
        # groupby halves remaining path lengths — O(log diameter) rounds.
        def as_requests(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["label"].to_numpy(np.int64),
                    "other": df["node"].to_numpy(np.int64),
                    "label": np.full(len(df), np.iinfo(np.int64).max, dtype=np.int64),
                }
            )

        jump_in = stepped.map_batches(as_requests, batch_format="pandas").union(
            stepped.map_batches(as_messages, batch_format="pandas")
        )
        new_labels = _min_by_node(
            jump_in.map_batches(add_kbucket, batch_format="pandas")
            .groupby("_kb")
            .map_groups(bucket_propagate, batch_format="pandas"),
            n_buckets=num_partitions,
            # pin the block count: union+sort otherwise grow blocks every
            # round, doubling task counts (measured 2x wall per round)
        ).repartition(num_partitions).materialize()

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
