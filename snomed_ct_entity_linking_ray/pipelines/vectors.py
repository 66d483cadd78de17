"""Similarity search over the ``embeddings`` table (engine addition).

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast once (``ray.put``) and every batch does one numpy matmul +
per-batch partial top-k, followed by a tiny global top-k per query — the
map-side combine keeps the shuffle at ``O(n_queries × k × n_batches)``
rows. The IVF-bucketed variant (``q_cosine_topk_ivf``) restricts search to
the query's coarse cell(s), the scale path for 10^12 rows.

Outputs carry integer ids + rank only (cosine crosses the oracle boundary
at ~2e-8 C++/numpy disagreement, so ranks — stable under that noise — are
what the DuckDB oracle checks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .common import broadcast, read, read_arrow

N_QUERIES = 16  # vec_id < 16 are the query set; the rest are candidates


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    tbl = read_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = tbl.to_pandas()
    q = df[df["vec_id"] < N_QUERIES].sort_values("vec_id")
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    return q["vec_id"].to_numpy(), Q


def q_cosine_topk(sf_dir: str, k: int = 5):
    """Exact brute-force cosine top-k per query over all candidates."""
    qids, Q = _query_matrix(sf_dir)
    ref = broadcast((qids, Q))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class Score:
        def __init__(self):
            self.qids, self.Q = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            cand = df[df["vec_id"] >= N_QUERIES]
            if len(cand) == 0:
                return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                     "match_id": pd.Series([], dtype=np.int64),
                                     "cos": pd.Series([], dtype=np.float64)})
            C = np.stack(cand["embedding"].to_numpy()).astype(np.float64)
            C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
            sims = self.Q @ C.T  # [nq, nc]
            ids = cand["vec_id"].to_numpy()
            nq, nc = sims.shape
            kk = min(k, nc)
            # batch-local top-k per query (partial combine)
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(self.qids, kk)
            cols = idx.ravel()
            return pd.DataFrame(
                {
                    "query_id": rows.astype(np.int64),
                    "match_id": ids[cols].astype(np.int64),
                    "cos": sims[np.repeat(np.arange(nq), kk), cols],
                }
            )

    partial = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "match_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "match_id": g["match_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def q_cosine_topk_ivf(sf_dir: str, k: int = 5, nprobe: int = 3):
    """IVF-style approximate top-k: ``label`` is the coarse cell; each query
    probes the ``nprobe`` cells whose centroids are nearest. Scale path:
    the per-batch matmul only sees candidates in probed cells."""
    tbl = read_arrow(sf_dir, "embeddings", ["vec_id", "embedding", "label"]).to_pandas()
    cand = tbl[tbl["vec_id"] >= N_QUERIES]
    E = np.stack(cand["embedding"].to_numpy()).astype(np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    labels = cand["label"].to_numpy()
    cells = np.unique(labels)
    centroids = np.stack([E[labels == c].mean(axis=0) for c in cells])
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)

    qids, Q = _query_matrix(sf_dir)
    probe = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    probed_cells = {int(q): set(int(cells[c]) for c in row) for q, row in zip(qids, probe)}
    ref = broadcast((qids, Q, probed_cells))

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    class Score:
        def __init__(self):
            self.qids, self.Q, self.cells = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            cand = df[df["vec_id"] >= N_QUERIES]
            out = {"query_id": [], "match_id": [], "cos": []}
            if len(cand) == 0:
                return pd.DataFrame({k2: pd.Series(v, dtype=np.float64 if k2 == "cos" else np.int64)
                                     for k2, v in out.items()})
            C = np.stack(cand["embedding"].to_numpy()).astype(np.float64)
            C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
            ids = cand["vec_id"].to_numpy()
            lab = cand["label"].to_numpy()
            for qi, qv in zip(self.qids, self.Q):
                mask = np.isin(lab, list(self.cells[int(qi)]))
                if not mask.any():
                    continue
                sims = C[mask] @ qv
                sel_ids = ids[mask]
                kk = min(k, len(sims))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                out["query_id"].extend([int(qi)] * kk)
                out["match_id"].extend(sel_ids[idx].astype(np.int64))
                out["cos"].extend(sims[idx])
            return pd.DataFrame(out)

    partial = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "match_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype(np.int64),
                "match_id": g["match_id"].astype(np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")
