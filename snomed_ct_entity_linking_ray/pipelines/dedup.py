"""Deduplication operator family (engine additions for training-data
pipelines): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
near-dup. All follow the same shape as the flagship linkage pipeline —
blocking keys → groupby shuffle → in-block pair verification — so they reuse
its skew discipline (bounded block sizes, logged drops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions import hashing
from ..functions.text import char_set_jaccard_batch
from .common import broadcast, read


def q_dedup_exact(sf_dir: str):
    """Exact dedup by content hash: keeper = min(doc_id) per text.

    Hash-partition + per-group-first (the groupby key is the md5, so the
    shuffle moves 16-byte keys + ids, not the texts at scale — here text is
    carried for the oracle compare)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fp"] = [hashing.md5_hex(t) for t in df["text"]]
        return df

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        i = g["doc_id"].idxmin()
        return pd.DataFrame(
            {
                "doc_id": [np.int64(g["doc_id"].min())],
                "text": [g.loc[i, "text"]],
                "n_copies": [np.int64(len(g))],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby("fp")
        .map_groups(keep_first, batch_format="pandas")
        .select_columns(["doc_id", "text", "n_copies"])
    )


def q_ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.9):
    """Char-set-Jaccard near-dup pairs within (lang, source) blocks —
    blocking → groupby shuffle → in-block pair generation → vectorized
    verification. Semantics identical to DuckDB ``jaccard()`` (char sets).
    """
    ds = read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        texts = g["text"].to_numpy()
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        ia, ib = np.triu_indices(n, k=1)
        sims = char_set_jaccard_batch(texts[ia], texts[ib])
        keep = sims >= threshold
        return pd.DataFrame(
            {"doc_a": ids[ia[keep]].astype(np.int64), "doc_b": ids[ib[keep]].astype(np.int64)}
        )

    return ds.groupby(["lang", "source"]).map_groups(pairs, batch_format="pandas")


def minhash_signatures(sf_dir: str, num_perm: int = 64):
    """Per-doc MinHash signatures as fixed-width list column."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    class Sig:
        def __init__(self):
            self.mh = hashing.MinHasher(num_perm=num_perm)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sigs = [
                self.mh.signature(hashing.shingle_hashes(t)).astype(np.uint64)
                for t in df["text"]
            ]
            return pd.DataFrame({"doc_id": df["doc_id"], "sig": sigs})

    return ds.map_batches(Sig, batch_format="pandas", concurrency=(1, 4))


def q_minhash_lsh_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                        jaccard_threshold: float = 0.5):
    """MinHash+LSH near-dup: shingle → signature → band buckets →
    groupby(band bucket) → candidate pairs → signature-similarity verify.

    Scale shape: the shuffle key is (band_id, band_hash); each doc emits
    ``bands`` small rows; verification is per-bucket and deduped by pair.
    """
    sigs = minhash_signatures(sf_dir, num_perm)

    mh = hashing.MinHasher(num_perm=num_perm)

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_key, rows_sig = [], [], []
        for did, sig in zip(df["doc_id"], df["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for key in mh.band_keys(sig, bands):
                rows_id.append(did)
                rows_key.append(key)
                rows_sig.append(sig)
        return pd.DataFrame({"doc_id": rows_id, "band": rows_key, "sig": rows_sig})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        S = np.stack(g["sig"].to_numpy())
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "est_jaccard": pd.Series([], dtype=np.float64)})
        ia, ib = np.triu_indices(n, k=1)
        est = (S[ia] == S[ib]).mean(axis=1)
        keep = est >= jaccard_threshold
        return pd.DataFrame(
            {
                "doc_a": ids[ia[keep]].astype(np.int64),
                "doc_b": ids[ib[keep]].astype(np.int64),
                "est_jaccard": est[keep],
            }
        )

    cand = (
        sigs.map_batches(explode_bands, batch_format="pandas")
        .groupby("band")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # a pair found in k bands appears k times → exact pair dedup
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pandas")


def q_simhash_buckets(sf_dir: str, prefix_bits: int = 12):
    """SimHash near-dup blocking: 64-bit simhash over word tokens, bucketed
    by the top ``prefix_bits`` bits (rotation-table variants are a natural
    extension; this emits the bucketed docs for downstream verify)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.array(
            [hashing.simhash64(t.split(" ")) for t in df["text"]], dtype=np.uint64
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": hs.astype(np.int64),  # two's-complement carrier
                "bucket": (hs >> np.uint64(64 - prefix_bits)).astype(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_embedding_neardup_pairs(sf_dir: str, threshold: float = 0.35):
    """Embedding-cosine near-dup pairs within label blocks (label acts as
    the coarse blocking key, mirroring an IVF cell assignment)."""
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        E = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                                 "vec_b": pd.Series([], dtype=np.int64)})
        sims = E @ E.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]].astype(np.int64), "vec_b": ids[ib[keep]].astype(np.int64)}
        )

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")
