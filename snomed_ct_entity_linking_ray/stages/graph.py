"""Concept-graph operators as dataset/broadcast ops — no networkx
(SURVEY.md S5: 2nd Place/src/snomed_graph.py:373-453 ``from_rf2``,
:212-233 ``get_descendants``).

The graph is an edge Dataset ``(child:int64, parent:int64, type_id:int64)``;
IS_A = 116680003. Traversals that the reference does with an in-memory
DiGraph become either (a) a broadcast-CSR BFS when the edge set is
terminology-sized (the SNOMED case, ~1M edges — fits every worker), or
(b) iterative frontier joins for general graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

IS_A = 116_680_003


def edges_from_relationship_rows(rel: rd.Dataset) -> rd.Dataset:
    """RF2 relationship snapshot rows → active IS_A edge list."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["active"] == 1) & (df["typeId"] == IS_A)]
        return pd.DataFrame(
            {
                "child": df["sourceId"].astype(np.int64),
                "parent": df["destinationId"].astype(np.int64),
                "type_id": np.int64(IS_A),
            }
        )

    return rel.map_batches(fn, batch_format="pandas")


class _CSR:
    """parent → children adjacency in two numpy arrays (broadcastable)."""

    def __init__(self, parents: np.ndarray, children: np.ndarray):
        order = np.argsort(parents, kind="stable")
        self.sorted_parents = parents[order]
        self.children = children[order]

    def kids(self, node: int) -> np.ndarray:
        lo = np.searchsorted(self.sorted_parents, node, side="left")
        hi = np.searchsorted(self.sorted_parents, node, side="right")
        return self.children[lo:hi]


def build_csr(edges: rd.Dataset) -> _CSR:
    df = edges.to_pandas()
    return _CSR(df["parent"].to_numpy(np.int64), df["child"].to_numpy(np.int64))


def descendants(csr: _CSR, root: int) -> set[int]:
    """BFS over the broadcast CSR (get_descendants semantics)."""
    seen: set[int] = set()
    frontier = [root]
    while frontier:
        nxt: list[int] = []
        for n in frontier:
            for c in csr.kids(int(n)):
                c = int(c)
                if c not in seen:
                    seen.add(c)
                    nxt.append(c)
        frontier = nxt
    return seen


def tag_descendants(
    ds: rd.Dataset, concept_col: str, csr: _CSR, root: int, out_col: str = "is_descendant"
) -> rd.Dataset:
    """Dataset op: mark rows whose concept is a descendant of ``root`` —
    the membership set is broadcast once via ray.put."""
    dset = descendants(csr, root)
    ref = ray.put(np.fromiter(dset, dtype=np.int64, count=len(dset)))

    class Tag:
        def __init__(self):
            arr = ray.get(ref)
            self.sorted = np.sort(arr)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vals = df[concept_col].to_numpy(np.int64)
            idx = np.searchsorted(self.sorted, vals)
            idx_c = np.clip(idx, 0, max(0, len(self.sorted) - 1))
            df = df.copy()
            df[out_col] = (len(self.sorted) > 0) & (self.sorted[idx_c] == vals)
            return df

    return ds.map_batches(Tag, batch_format="pandas", concurrency=(1, 4))
