"""Deterministic train/test splits and K-fold assignment (SURVEY.md T4).

The reference uses seeded shuffles (1st Place/src/mimic_dev_main.py:44-50,
seed 12345; 5-fold CV :69-91 seed 123456; 2nd Place/src/preprocess.py:
100-113 KFold(4, shuffle, random_state=42)). Distributed form: a stable
per-key hash assigns each row to a fold/split — deterministic, order-
independent, and needs no shuffle at all (vs ``random_shuffle`` which
moves every block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .hashing import stable_u64


def _bucket(key: str, seed: int, mod: int) -> int:
    return stable_u64(f"{seed}:{key}") % mod


def train_test_split(
    ds: rd.Dataset, key_col: str, test_fraction: float = 0.25, seed: int = 12345
) -> tuple[rd.Dataset, rd.Dataset]:
    """Split by stable key hash; same key always lands on the same side."""
    cut = int(test_fraction * 1_000_000)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = [_bucket(str(k), seed, 1_000_000) for k in df[key_col]]
        return df

    tagged = ds.map_batches(tag, batch_format="pandas")
    train = tagged.map_batches(
        lambda df: df[df["_b"] >= cut].drop(columns=["_b"]), batch_format="pandas"
    )
    test = tagged.map_batches(
        lambda df: df[df["_b"] < cut].drop(columns=["_b"]), batch_format="pandas"
    )
    return train, test


def kfold_assign(
    ds: rd.Dataset, key_col: str, k: int = 5, seed: int = 123456
) -> rd.Dataset:
    """Add a ``fold`` column (0..k-1) by stable key hash."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fold"] = np.array(
            [_bucket(str(x), seed, k) for x in df[key_col]], dtype=np.int64
        )
        return df

    return ds.map_batches(tag, batch_format="pandas")
