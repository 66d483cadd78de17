"""Evaluation metrics (SURVEY.md G8/G9/D5).

``iou_per_concept`` reproduces the challenge's golden metric — macro-
averaged per-concept character IoU (1st Place/src/scoring.py:10-47;
duplicate impls 2nd Place/submission/iou.py:6-50, 3rd Place/src/scoring.py)
— but distributed: instead of a dense char×doc matrix, spans explode to
(concept, doc, interval) rows and each concept group computes interval
intersection/union arithmetic (no dense allocation; shuffle key = concept).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _interval_lengths(intervals: list[tuple[int, int]]) -> int:
    """Total covered length of a set of (possibly overlapping) intervals."""
    total = 0
    last_end = -1
    for s, e in sorted(intervals):
        if s > last_end:
            total += e - s
            last_end = e
        elif e > last_end:
            total += e - last_end
            last_end = e
    return total


def _intersection_length(
    a: list[tuple[int, int]], b: list[tuple[int, int]]
) -> int:
    a, b = sorted(a), sorted(b)
    i = j = 0
    total = 0
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0])
        e = min(a[i][1], b[j][1])
        if s < e:
            total += e - s
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return total


def iou_per_concept(pred: rd.Dataset, gold: rd.Dataset) -> rd.Dataset:
    """pred/gold: (doc_id, start, end, concept_id) span datasets →
    (concept_id, iou) — per-concept char IoU across all docs."""

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "concept_id": df["concept_id"].astype(np.int64),
                    "doc_id": df["doc_id"],
                    "start": df["start"].astype(np.int64),
                    "end": df["end"].astype(np.int64),
                    "side": side,
                }
            )

        return fn

    both = pred.map_batches(tag("p"), batch_format="pandas").union(
        gold.map_batches(tag("g"), batch_format="pandas")
    )

    def concept_iou(g: pd.DataFrame) -> pd.DataFrame:
        inter = 0
        union = 0
        for _doc, d in g.groupby("doc_id"):
            p = [
                (int(s), int(e))
                for s, e in zip(d[d["side"] == "p"]["start"], d[d["side"] == "p"]["end"])
            ]
            q = [
                (int(s), int(e))
                for s, e in zip(d[d["side"] == "g"]["start"], d[d["side"] == "g"]["end"])
            ]
            ii = _intersection_length(p, q)
            uu = _interval_lengths(p) + _interval_lengths(q) - ii
            inter += ii
            union += uu
        return pd.DataFrame(
            {
                "concept_id": [np.int64(g["concept_id"].iloc[0])],
                "iou": [inter / union if union else 1.0],
            }
        )

    return both.groupby("concept_id").map_groups(concept_iou, batch_format="pandas")


def macro_iou(per_concept: rd.Dataset) -> float:
    df = per_concept.to_pandas()
    return float(df["iou"].mean()) if len(df) else 0.0
