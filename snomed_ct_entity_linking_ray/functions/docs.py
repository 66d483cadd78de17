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
    """docs(doc_id, spans) -> (doc_id, text, n_media, spans).

    Fully vectorized: Arrow list flattening, a rebuilt per-doc ListArray of
    text pieces, and ``pc.binary_join`` for the per-row concat — NO per-row
    Python on the text path (the reference reads note text row-by-row,
    3rd Place/src/document.py:83-95; here the whole batch is one kernel
    chain)."""
    import numpy as np

    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()  # struct array of all spans, order-preserving
    kinds = flat.field("kind")
    texts = flat.field("text")
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    n_rows = len(batch)
    counts = np.diff(offsets)
    parents = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
    # per-row list of text-span strings: filter values, rebuild offsets from
    # per-parent text-span counts, then one binary_join kernel
    txt_counts = np.bincount(parents[is_text], minlength=n_rows)
    txt_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(txt_counts, out=txt_offsets[1:])
    txt_values = texts.filter(pa.array(is_text))
    txt_lists = pa.ListArray.from_arrays(pa.array(txt_offsets), txt_values)
    doc_texts = pc.binary_join(txt_lists, "")
    n_media = np.zeros(n_rows, dtype=np.int32)
    np.add.at(n_media, parents[~is_text], 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": doc_texts,
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
