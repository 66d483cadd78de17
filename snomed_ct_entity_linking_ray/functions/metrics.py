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


def span_prf(pred: rd.Dataset, gold: rd.Dataset) -> dict:
    """D5/J8 (3rd Place/src/metrics.py:5-52,79-116): exact-span TP/FP/FN and
    precision/recall/F1 via an inner join on (doc_id, start, end,
    concept_id). Sides are tagged and counted per batch; totals combine
    driver-side (three scalars)."""

    def key_rows(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": [
                        f"{d}:{s}:{e}:{c}"
                        for d, s, e, c in zip(
                            df["doc_id"], df["start"], df["end"], df["concept_id"]
                        )
                    ],
                    "side": side,
                }
            )

        return fn

    both = (
        pred.map_batches(key_rows("p"), batch_format="pandas")
        .union(gold.map_batches(key_rows("g"), batch_format="pandas"))
        .to_pandas()
    )
    counts = both.groupby(["k", "side"]).size().unstack(fill_value=0)
    p = counts.get("p", pd.Series(0, index=counts.index))
    g = counts.get("g", pd.Series(0, index=counts.index))
    tp = int(((p > 0) & (g > 0)).sum())
    fp = int(((p > 0) & (g == 0)).sum())
    fn = int(((p == 0) & (g > 0)).sum())
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": prec,
        "recall": rec,
        "f1": 2 * prec * rec / max(1e-9, prec + rec),
    }


def per_doc_concept_set_iou(pred: rd.Dataset, gold: rd.Dataset) -> rd.Dataset:
    """G8 (1st Place/src/note_scoring.py:9-25): per-doc IoU of predicted vs
    gold CONCEPT SETS (ignoring offsets)."""

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "concept_id": df["concept_id"].astype(np.int64),
                    "side": side,
                }
            )
            return out.drop_duplicates()

        return fn

    both = pred.map_batches(tag("p"), batch_format="pandas").union(
        gold.map_batches(tag("g"), batch_format="pandas")
    )

    def doc_iou(g: pd.DataFrame) -> pd.DataFrame:
        p = set(g[g["side"] == "p"]["concept_id"])
        q = set(g[g["side"] == "g"]["concept_id"])
        union = len(p | q)
        return pd.DataFrame(
            {
                "doc_id": [g["doc_id"].iloc[0]],
                "iou": [len(p & q) / union if union else 1.0],
            }
        )

    return both.groupby("doc_id").map_groups(doc_iou, batch_format="pandas")
