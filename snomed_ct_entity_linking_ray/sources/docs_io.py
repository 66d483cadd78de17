"""Documents-table IO with input-format dispatch (Parquet | Lance).

The deployment's input hint is "a Lance table of interleaved text + media
documents". Lance and Parquet carry the identical Arrow schema here
(``doc_id: int64, spans: list<struct<kind, text, media_ref, offset>>``),
so the engine dispatches on the dataset path:

- ``*.lance`` (or a directory containing ``_versions/``) → Ray Data's
  native ``read_lance`` (fragment-parallel, column-pruned, zero-copy
  Arrow), when the ``lance`` package is importable.
- anything else → ``read_parquet`` with the same downstream pipeline.

This container has no network access and no ``lance`` wheel baked in, so
Parquet is the TESTED substitution (see README "Input formats"); the
dispatch keeps the Lance path one `pip install pylance` away with no other
code changes — every stage after the read consumes Arrow blocks and never
sees the storage format.
"""

from __future__ import annotations

import os

import ray.data as rd


def is_lance_path(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_docs(path: str, *, columns: list[str] | None = None,
              override_num_blocks: int | None = None) -> rd.Dataset:
    """Read the interleaved documents table, format-dispatched."""
    if is_lance_path(path):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                f"{path} looks like a Lance dataset but the 'lance' package "
                "is not installed in this environment; install pylance or "
                "convert the table to Parquet (identical schema — see "
                "README 'Input formats')."
            ) from e
        kw = {}
        if columns is not None:
            kw["columns"] = columns
        if override_num_blocks is not None:
            kw["override_num_blocks"] = override_num_blocks
        return rd.read_lance(path, **kw)
    kw = {}
    if columns is not None:
        kw["columns"] = columns
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, **kw)
