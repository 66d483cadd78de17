"""Mention post-processing stages (SURVEY.md M16/M19/M26, D1).

- ``filter_blacklist``   M19 (2nd Place/submission/second_stage_postprocess.
  py:67-71,88-90): drop mentions whose normalized surface is a stopword or
  too short.
- ``apply_remove_list`` / ``apply_add_list``  M26 (3rd Place/src/
  snomedctentitylinking.py:160-187): subtract terms, regex-inject terms.
- ``merge_predictions``  D1 (1st Place/src/mimic_predict.py:43-49): union
  two mention datasets then per-doc overlap removal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.overlaps import remove_overlaps
from ..functions.text import locate_term, normalize_text

MENTION_STOPWORDS = frozenset(
    {"the", "a", "and", "of", "in", "on", "no", "not", "with", "for", "to",
     "at", "was", "is", "left", "right", "old", "new", "mild"}
)


def filter_blacklist(
    mentions: rd.Dataset,
    stopwords: frozenset[str] = MENTION_STOPWORDS,
    min_len: int = 3,
) -> rd.Dataset:
    ref = ray.put(frozenset(stopwords))

    class F:
        def __init__(self):
            self.stop = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            surf = df["surface"].astype(str)
            keep = (~surf.isin(self.stop)) & (surf.str.len() >= min_len)
            return df[keep.to_numpy()]

    return mentions.map_batches(F, batch_format="pandas", concurrency=(1, 4))


def apply_remove_list(mentions: rd.Dataset, remove_terms: list[str]) -> rd.Dataset:
    """Anti-filter on normalized surface (broadcast term set)."""
    ref = ray.put({normalize_text(t) for t in remove_terms})

    class F:
        def __init__(self):
            self.rm = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep = ~df["surface"].isin(self.rm)
            return df[keep.to_numpy()]

    return mentions.map_batches(F, batch_format="pandas", concurrency=(1, 4))


def apply_add_list(
    docs: rd.Dataset, add_terms: list[tuple[str, int]]
) -> rd.Dataset:
    """Regex-inject mentions for (term, concept_id) adds over the raw doc
    text (docs: doc_id, text) — full-word tolerant matching (M24)."""
    ref = ray.put(list(add_terms))

    class F:
        def __init__(self):
            self.adds = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = {"doc_id": [], "start": [], "end": [], "concept_id": [],
                   "surface": []}
            for doc_id, text in zip(df["doc_id"], df["text"]):
                for term, cid in self.adds:
                    for s, e in locate_term(text, term):
                        out["doc_id"].append(doc_id)
                        out["start"].append(s)
                        out["end"].append(e)
                        out["concept_id"].append(cid)
                        out["surface"].append(text[s:e])
            return pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "start": np.array(out["start"], dtype=np.int32),
                    "end": np.array(out["end"], dtype=np.int32),
                    "concept_id": np.array(out["concept_id"], dtype=np.int64),
                    "surface": out["surface"],
                }
            )

    return docs.map_batches(F, batch_format="pandas", concurrency=(1, 4))


def merge_predictions(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
    """D1: union of two span prediction sets → per-doc overlap removal
    (shared columns: doc_id, start, end, concept_id)."""
    cols = ["doc_id", "start", "end", "concept_id"]
    both = a.select_columns(cols).union(b.select_columns(cols))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        spans = [
            {"start": int(s), "end": int(e), "concept_id": int(c)}
            for s, e, c in zip(g["start"], g["end"], g["concept_id"])
        ]
        uniq = {(sp["start"], sp["end"], sp["concept_id"]) for sp in spans}
        kept = remove_overlaps([dict(start=x, end=y, concept_id=z) for x, y, z in uniq])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].iloc[0],
                "start": np.array([k["start"] for k in kept], dtype=np.int32),
                "end": np.array([k["end"] for k in kept], dtype=np.int32),
                "concept_id": np.array([k["concept_id"] for k in kept], dtype=np.int64),
            }
        )

    return both.groupby("doc_id").map_groups(resolve, batch_format="pandas")
