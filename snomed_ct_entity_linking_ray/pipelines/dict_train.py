"""Dictionary "training" aggregates (SURVEY.md §2.5 G2-G7, §3.1 train flow).

The reference builds its match dictionary from training annotations by
counting (section, mention) → concept observations, majority-voting, and
pruning low-precision keys (1st Place/src/mimic_train.py:327-379 mock_train,
:266-311 greedy selection; 2nd Place/src/static_dict.py:116-182). Here the
fixture ``gold_mentions`` table plays the training-annotation role and each
aggregate is a partial-then-final combine over Datasets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .. import fixtures
from ..functions.text import normalize_text
from .common import broadcast


def _gold(sf_dir: str, columns=None) -> rd.Dataset:
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    return rd.read_parquet(f"{fdir}/gold_mentions.parquet", columns=columns)


def q_dict_majority(sf_dir: str):
    """G2: per (section, normalized surface) → modal concept_id with count
    support — partial counts per batch, small final groupby, per-key argmax
    (deterministic min-cid tiebreak)."""
    gold = _gold(sf_dir, ["section", "surface", "concept_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "section": df["section"],
                "surface": [normalize_text(s) for s in df["surface"]],
                "concept_id": df["concept_id"].astype(np.int64),
            }
        )
        return out.groupby(
            ["section", "surface", "concept_id"], as_index=False
        ).size().rename(columns={"size": "n"})

    counts = (
        gold.map_batches(partial, batch_format="pandas")
        .groupby(["section", "surface", "concept_id"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "concept_id"], ascending=[False, True])
        return pd.DataFrame(
            {
                "section": [g["section"].iloc[0]],
                "surface": [g["surface"].iloc[0]],
                "concept_id": [np.int64(g["concept_id"].iloc[0])],
                "support": [np.int64(g["n"].sum())],
            }
        )

    return counts.groupby(["section", "surface"]).map_groups(
        argmax, batch_format="pandas"
    )


def q_allowed_sections(sf_dir: str):
    """G5: per concept hierarchy, the sorted distinct set of headers its
    concepts were observed under (collect_set as distinct-pairs + local
    sort; the concepts dimension is broadcast)."""
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    import pyarrow.parquet as pq

    c = pq.read_table(fdir + "/concepts.parquet", columns=["concept_id", "hierarchy"])
    hier = dict(zip(c["concept_id"].to_pylist(), c["hierarchy"].to_pylist()))
    ref = broadcast(hier)

    gold = _gold(sf_dir, ["section", "concept_id"])

    class Pairs:
        def __init__(self):
            self.hier = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "hierarchy": [self.hier.get(int(c), "?") for c in df["concept_id"]],
                    "section": df["section"],
                }
            )
            return out.drop_duplicates()

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    pairs = (
        gold.map_batches(Pairs, batch_format="pandas", concurrency=(1, 4))
        .groupby(["hierarchy", "section"])
        .map_groups(first, batch_format="pandas")
    )

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hierarchy": [g["hierarchy"].iloc[0]],
                "sections": ["|".join(sorted(g["section"]))],
                "n_sections": [np.int64(len(g))],
            }
        )

    return pairs.groupby("hierarchy").map_groups(collect, batch_format="pandas")


def greedy_key_selection(
    keys: list[tuple[str, int, int]], min_precision: float = 0.8
) -> list[str]:
    """G4 (1st Place/src/mimic_train.py:266-311): per-concept greedy key
    pick — sort candidate keys by correct/incorrect ratio (then support),
    add keys while the RUNNING precision of the accepted set stays ≥
    ``min_precision``. Pure function: runs inside a per-concept
    ``map_groups`` in the dictionary-build pipeline.

    keys: [(key, n_correct, n_incorrect)] → accepted keys, in pick order.
    """
    order = sorted(
        keys,
        key=lambda k: (-(k[1] / max(1, k[1] + k[2])), -(k[1] + k[2]), k[0]),
    )
    picked: list[str] = []
    tot_c = tot_i = 0
    for key, c, i in order:
        if (tot_c + c) / max(1, tot_c + c + tot_i + i) >= min_precision:
            picked.append(key)
            tot_c += c
            tot_i += i
    return picked


def q_dict_precision(sf_dir: str, threshold: float = 0.9):
    """G3/G7: score every extracted mention against gold at (doc, start,
    end); per surface compute precision = tp / (tp + fp) and keep surfaces
    ≥ threshold (2nd Place/src/static_dict.py:167-188 semantics)."""
    from .entity_link import extract_mentions

    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    import pyarrow.parquet as pq

    g = pq.read_table(fdir + "/gold_mentions.parquet", columns=["doc_id", "start", "end"])
    gold_set = set(
        zip(g["doc_id"].to_pylist(), g["start"].to_pylist(), g["end"].to_pylist())
    )
    ref = broadcast(gold_set)

    mentions, state, _ = extract_mentions(sf_dir)
    surfaces_ref = broadcast(np.array(state["surfaces"], dtype=object))

    class Score:
        def __init__(self):
            self.gold = ray.get(ref)
            self.surfaces = ray.get(surfaces_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            tp = np.array(
                [
                    (d, int(s), int(e)) in self.gold
                    for d, s, e in zip(df["doc_id"], df["start"], df["end"])
                ],
                dtype=np.int64,
            )
            out = pd.DataFrame(
                {
                    "surface": self.surfaces[df["sid"].to_numpy()],
                    "tp": tp,
                    "n": np.int64(1),
                }
            )
            return out.groupby("surface", as_index=False).sum()

    totals = (
        mentions.map_batches(Score, batch_format="pandas", concurrency=(1, 4))
        .groupby("surface")
        .aggregate(Sum("tp", alias_name="tp"), Sum("n", alias_name="n"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        prec = df["tp"] / df["n"]
        out = pd.DataFrame(
            {
                "surface": df["surface"],
                "tp": df["tp"].astype(np.int64),
                "n": df["n"].astype(np.int64),
            }
        )
        return out[prec >= threshold]

    return totals.map_batches(finish, batch_format="pandas")
