"""Documents-table IO with input-format dispatch (Parquet | Lance |
JSONL | CSV).

The deployment's input hint is "a Lance table of interleaved text + media
documents". Lance and Parquet carry the identical Arrow schema here
(``doc_id: int64, spans: list<struct<kind, text, media_ref, offset>>``),
so the engine dispatches on the dataset path:

- ``*.lance`` (or a directory containing ``_versions/``) → Ray Data's
  native ``read_lance`` (fragment-parallel, column-pruned, zero-copy
  Arrow), when the ``lance`` package is importable.
- ``*.jsonl`` / ``*.json`` → ``read_json`` (pyarrow JSON reader; nested
  ``spans`` structs round-trip — tests/test_sources.py pins it).
- ``*.csv`` → ``read_csv`` (FLAT tables only; a nested spans column has
  no faithful CSV encoding, so reading one raises downstream by schema
  mismatch rather than silently corrupting).
- anything else → ``read_parquet`` with the same downstream pipeline.

JSON/CSV readers have no column pushdown in Ray Data, so ``columns``
is applied as a ``select_columns`` projection immediately after the
read — same visible schema, the pruning just happens post-scan
(another reason Parquet/Lance are the production formats).

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
    if path.endswith((".jsonl", ".json")):
        kw = {}
        if override_num_blocks is not None:
            kw["override_num_blocks"] = override_num_blocks
        ds = rd.read_json(path, **kw)
        return ds.select_columns(columns) if columns is not None else ds
    if path.endswith(".csv"):
        kw = {}
        if override_num_blocks is not None:
            kw["override_num_blocks"] = override_num_blocks
        ds = rd.read_csv(path, **kw)
        return ds.select_columns(columns) if columns is not None else ds
    kw = {}
    if columns is not None:
        kw["columns"] = columns
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, **kw)
