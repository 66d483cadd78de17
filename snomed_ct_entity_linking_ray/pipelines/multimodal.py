"""Multimodal column plumbing (engine addition per the build brief).

Media payloads are opaque ``media_ref`` references (the fixture docs carry
``kind=="media"`` spans, BASELINE.json input_hint). The Ray-side plumbing —
schemas, actor-pool signatures, batch sizing, output layout — is real and
tested; the actual byte decoding is STUBBED because no image/audio libs
exist in this container:

- ``decode="fake"`` (default): deterministic metadata derived from the ref
  hash — stable across processes, good for pipeline testing.
- ``decode="real"``: gated behind an import-try of PIL; raises
  ``NotImplementedError`` here (documented container limitation).

At scale, media bytes would live in a ``binary`` column read with
``read_binary_files`` / Lance blobs; decode stages use SMALL batch sizes
(payloads are MBs, not KBs) and bounded actor-pool concurrency so
batch × concurrency fits worker heaps (guide: memory-aware batch sizing).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import fixtures


def media_rows(sf_dir: str) -> rd.Dataset:
    """Explode docs' media spans → (doc_id, media_ref, offset) rows."""
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    docs = rd.read_parquet(f"{fdir}/docs.parquet")

    def explode(batch: pa.Table) -> pa.Table:
        # Arrow list-kernel explode (the flatten_batch pattern,
        # functions/docs.py): flatten the spans ListArray, mask media spans,
        # and take parent doc_ids by repeat — no per-row Python.
        import pyarrow.compute as pc

        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()  # struct array, order-preserving
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        parents = np.repeat(
            np.arange(len(batch), dtype=np.int64), np.diff(offsets)
        )
        is_media = pc.equal(flat.field("kind"), "media")
        mask = is_media.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pc.take(batch["doc_id"], pa.array(parents[mask])),
                "media_ref": flat.field("media_ref").filter(is_media),
                "offset": pc.cast(flat.field("offset").filter(is_media), pa.int32()),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage. State (codec tables / model weights in a
    real deployment) is built once per actor."""

    def __init__(self, mode: str = "fake"):
        if mode == "real":
            try:
                import PIL  # noqa: F401
            except ImportError as e:  # container has no imaging libs
                raise NotImplementedError(
                    "real media decode requires an imaging library not "
                    "present in this environment; use mode='fake'"
                ) from e
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        h = np.array([zlib.crc32(r.encode()) for r in refs], dtype=np.uint64)
        width = (64 + h % 1920).astype(np.int32)
        height = (64 + (h >> np.uint64(11)) % 1080).astype(np.int32)
        n_frames = (1 + (h >> np.uint64(22)) % 300).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "offset": batch["offset"],
                "width": pa.array(width),
                "height": pa.array(height),
                "n_frames": pa.array(n_frames),
            }
        )


class FrameSampler:
    """Emit one row per sampled frame (every ``stride``-th frame) — the
    flat-map expansion stage a video pipeline needs."""

    def __init__(self, stride: int = 30):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized flat-map: ceil(n_frames/stride) sampled frames per
        # media row, expanded with repeat/cumsum arithmetic (no row loop)
        import pyarrow.compute as pc

        nf = np.asarray(batch["n_frames"].to_numpy(zero_copy_only=False), dtype=np.int64)
        counts = (nf + self.stride - 1) // self.stride
        parents = np.repeat(np.arange(len(nf), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            starts, counts
        )
        return pa.table(
            {
                "media_ref": pc.take(batch["media_ref"], pa.array(parents)),
                "frame_idx": pa.array(
                    (within * self.stride).astype(np.int32), pa.int32()
                ),
            }
        )


def q_media_inventory(sf_dir: str):
    """Decoded-media inventory: one row per media span with fake-decoded
    metadata. Small batches + bounded pool per the memory-aware rule."""
    return media_rows(sf_dir).map_batches(
        MediaDecoder,
        fn_constructor_args=("fake",),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def q_frame_samples(sf_dir: str):
    return q_media_inventory(sf_dir).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )
