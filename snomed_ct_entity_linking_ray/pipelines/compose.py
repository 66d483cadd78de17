"""Declarative pipeline composition — the user-extension surface
(SURVEY.md §2.10).

The reference has no plugin API; its implicit extension points are chains
of dictionary expanders (1st Place/src/mimic_train.py:446-472), term
remove/add lists (3rd Place/src/snomedctentitylinking.py:60-84) and
pluggable embedder/checkpoint lists (2nd Place/src/preprocess.py:146-148).
This module is the engine's explicit version of that surface: a ``Stage``
protocol (name, schema contract, fn-or-actor-class, per-stage resources)
composed into one lazy ``ray.data.Dataset`` chain.

Schema contracts are enforced PER BATCH inside the shipped callable (a
column-name check is O(#columns), not O(rows)), so a mis-wired stage fails
loudly on the first batch with the stage name in the error — instead of a
KeyError deep inside a worker UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data as rd


def _columns_of(batch) -> set[str]:
    if isinstance(batch, pa.Table):
        return set(batch.column_names)
    return set(batch.columns)  # pandas


def _check(batch, required, stage_name: str, direction: str) -> None:
    if not required:
        return
    missing = set(required) - _columns_of(batch)
    if missing:
        raise ValueError(
            f"stage '{stage_name}': {direction} schema contract violated — "
            f"missing columns {sorted(missing)} "
            f"(have {sorted(_columns_of(batch))})"
        )


class _CheckedStateful:
    """Module-level actor wrapper around a user stage class.

    Deliberately composition, not a dynamically-created subclass: a class
    built inside a method pickles by value with its BASE by reference, so
    a user class from a module not importable on the workers crash-loops
    the actor and the streaming executor waits forever on a pending actor
    (observed with test-module classes). A module-level wrapper pickles by
    reference to THIS module — always importable where the engine is
    installed — and carries the user class through ``fn_constructor_args``,
    the same channel map_batches already uses."""

    def __init__(self, inner_cls, ctor_args, schema_in, schema_out, name):
        self.inner = inner_cls(*ctor_args)  # state loads once per actor
        self.schema_in = schema_in
        self.schema_out = schema_out
        self.name = name

    def __call__(self, batch):
        _check(batch, self.schema_in, self.name, "input")
        out = self.inner(batch)
        _check(out, self.schema_out, self.name, "output")
        return out


@dataclass
class Stage:
    """One pipeline step: a plain function (stateless task) or a callable
    CLASS (stateful actor pool — weights/dictionaries load in __init__).

    ``schema_in`` / ``schema_out`` are the declared column contracts
    (checked per batch; None skips the check). ``concurrency`` / ``num_cpus``
    / ``batch_size`` pass straight through to ``map_batches`` so each stage
    sizes its own pool (guide: stateful stages are actor pools)."""

    name: str
    fn: Callable | type
    schema_in: tuple[str, ...] | None = None
    schema_out: tuple[str, ...] | None = None
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: Any = None
    num_cpus: float | None = None
    fn_constructor_args: tuple = field(default_factory=tuple)

    def _wrapped(self):
        stage = self
        if isinstance(self.fn, type):
            return _CheckedStateful
        fn = self.fn

        def checked(batch):
            _check(batch, stage.schema_in, stage.name, "input")
            out = fn(batch)
            _check(out, stage.schema_out, stage.name, "output")
            return out

        checked.__name__ = getattr(fn, "__name__", stage.name)
        return checked


def build_pipeline(source: rd.Dataset, stages: list[Stage]) -> rd.Dataset:
    """Compose stages into one lazy Dataset chain (nothing executes here —
    the streaming executor schedules/pipelines the whole chain when a sink
    consumes it). Duplicate stage names are rejected so lineage metadata
    stays unambiguous."""
    names = [s.name for s in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    ds = source
    for s in stages:
        kwargs: dict[str, Any] = {"batch_format": s.batch_format}
        if s.batch_size is not None:
            kwargs["batch_size"] = s.batch_size
        if s.concurrency is not None:
            kwargs["concurrency"] = s.concurrency
        if s.num_cpus is not None:
            kwargs["num_cpus"] = s.num_cpus
        if isinstance(s.fn, type):
            kwargs["fn_constructor_args"] = (
                s.fn,
                s.fn_constructor_args,
                s.schema_in,
                s.schema_out,
                s.name,
            )
        ds = ds.map_batches(s._wrapped(), **kwargs)
    return ds


def pipeline_lineage(stages: list[Stage]) -> list[dict]:
    """Serializable per-stage lineage (the checkpoint writer's ``lineage``
    field): name + declared contracts + execution shape."""
    return [
        {
            "name": s.name,
            "schema_in": list(s.schema_in) if s.schema_in else None,
            "schema_out": list(s.schema_out) if s.schema_out else None,
            "stateful": isinstance(s.fn, type),
            "batch_format": s.batch_format,
        }
        for s in stages
    ]


# --- driver-verified demo of the extension surface -------------------------

class TokenThreshold:
    """Stateful demo stage: the threshold 'loads' in __init__ (stands in
    for model weights / compiled patterns in a real user stage)."""

    def __init__(self, min_tokens: int):
        self.min_tokens = min_tokens

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["n_tokens"], self.min_tokens))


def _tokenize_stage(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = pc.add(pc.count_substring(t["text"], " "), 1)
    return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def q_compose_pipeline(sf_dir: str, min_tokens: int = 50):
    """The §2.10 extension surface as a driver-checked query: a user-style
    two-stage pipeline (stateless Arrow tokenize -> stateful actor-pool
    threshold) built through ``Stage``/``build_pipeline``, so the contract
    wrapper, fn_constructor_args plumbing and actor-pool path are verified
    against a DuckDB oracle — not just unit-tested."""
    import os

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    stages = [
        Stage(
            "tokenize",
            _tokenize_stage,
            schema_in=("doc_id", "text"),
            schema_out=("doc_id", "n_tokens"),
        ),
        Stage(
            "token_threshold",
            TokenThreshold,
            schema_in=("doc_id", "n_tokens"),
            schema_out=("doc_id", "n_tokens"),
            fn_constructor_args=(min_tokens,),
            concurrency=(1, 2),
        ),
    ]
    return build_pipeline(ds, stages)
