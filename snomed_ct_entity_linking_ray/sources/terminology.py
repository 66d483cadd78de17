"""Terminology (RF2-shaped) build pipeline (SURVEY.md S3/S4, M6-M11, D6).

Reproduces the reference's concept-table construction semantics
(1st Place/src/process_data.py):

- :35-72  read concept + description snapshot TSVs, keep ``active == 1``
  rows, join descriptions to concepts on conceptId, map typeId to FSN/SYN,
  regex-extract the hierarchy from the FSN's trailing ``(...)`` suffix
- :89-105 keep only concepts in the allowed hierarchies
- :168-252 merge extra synonym sources, priority-ordered dedup
  (``drop_duplicates(keep="first")`` — earlier source wins; here an
  explicit ``source_rank`` column, SURVEY.md D6)
- :255-298 abbreviation equi-match: the O(n·m) loop becomes a hash join on
  the normalized name (M11)

Ray shape: TSVs → ``read_csv``; the description join broadcasts the
concept side (terminology is dictionary-sized); dedup = groupby(key) →
min-rank row.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.text import normalize_text

_HIERARCHY_RE = re.compile(r"\(([^()]+)\)\s*$")

ALLOWED_HIERARCHIES = ("finding", "procedure", "body structure")


def read_rf2_tsv(path: str) -> rd.Dataset:
    """Tab-separated RF2-style snapshot reader."""
    from ray.data.datasource import CSVDatasource  # noqa: F401  (doc pointer)
    import pyarrow.csv as pacsv

    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )


def extract_hierarchy(fsn: str) -> str:
    m = _HIERARCHY_RE.search(fsn)
    return m.group(1).strip() if m else ""


def build_concept_table(
    concepts: rd.Dataset,
    descriptions: rd.Dataset,
    allowed: tuple[str, ...] = ALLOWED_HIERARCHIES,
) -> rd.Dataset:
    """concepts(id, active, fsn) ⋈ descriptions(conceptId, active, term,
    typeId) → (concept_id, name, kind, hierarchy) rows.

    The concept side (small: terminology-bounded) is broadcast; the
    description stream filters/joins per batch — no shuffle.
    """
    cdf = concepts.to_pandas()
    cdf = cdf[cdf["active"] == 1].copy()
    cdf["hierarchy"] = [extract_hierarchy(f) for f in cdf["fsn"]]
    cdf = cdf[cdf["hierarchy"].isin(allowed)]
    cmap = dict(zip(cdf["id"], cdf["hierarchy"]))
    ref = ray.put(cmap)

    class JoinDesc:
        def __init__(self):
            self.hier = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["active"] == 1]
            keep = df["conceptId"].isin(self.hier.keys())
            df = df[keep]
            kind = np.where(df["typeId"] == 900000000000003001, "FSN", "SYN")
            return pd.DataFrame(
                {
                    "concept_id": df["conceptId"].astype(np.int64),
                    "name": df["term"],
                    "kind": kind,
                    "hierarchy": [self.hier[c] for c in df["conceptId"]],
                }
            )

    return descriptions.map_batches(JoinDesc, batch_format="pandas", concurrency=(1, 4))


def priority_dedup(
    ds: rd.Dataset, key_cols: list[str], rank_col: str = "source_rank"
) -> rd.Dataset:
    """D6: keep the lowest-rank row per key (the distributed, explicit form
    of order-sensitive ``drop_duplicates(keep="first")``)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([rank_col] + key_cols, kind="mergesort").head(1)

    return ds.groupby(key_cols).map_groups(first, batch_format="pandas")


def abbreviation_match(abbreviations: rd.Dataset, concepts: rd.Dataset) -> rd.Dataset:
    """M11: abbreviation meaning == concept name, tolerant of a short
    trailing ``(...)`` suffix — normalize-key equi-join with the concept
    side broadcast (replaces the reference's nested loop)."""
    cdf = concepts.to_pandas()
    by_norm: dict[str, int] = {}
    for cid, name in zip(cdf["concept_id"], cdf["name"]):
        stripped = _HIERARCHY_RE.sub("", name).strip()
        for k in {normalize_text(name), normalize_text(stripped)}:
            if k and k not in by_norm:
                by_norm[k] = int(cid)
    ref = ray.put(by_norm)

    class Match:
        def __init__(self):
            self.by_norm = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            cids = [self.by_norm.get(normalize_text(m), -1) for m in df["meaning"]]
            out = pd.DataFrame(
                {
                    "abbr": df["abbr"],
                    "meaning": df["meaning"],
                    "concept_id": np.array(cids, dtype=np.int64),
                }
            )
            return out[out["concept_id"] >= 0]

    return abbreviations.map_batches(Match, batch_format="pandas", concurrency=(1, 4))
