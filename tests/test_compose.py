"""Stage protocol / declarative composition (SURVEY.md §2.10 extension
surface): contract enforcement, stateless + stateful stages, lineage.

UDFs are built by local factories (not module-level defs) so cloudpickle
ships them BY VALUE: a module-level def in a test file pickles by
reference to ``test_compose``, which Ray workers cannot import — the
exact failure mode compose._CheckedStateful exists to avoid for the
engine's own wrapper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from snomed_ct_entity_linking_ray.pipelines.compose import (
    Stage,
    build_pipeline,
    pipeline_lineage,
)


def _source() -> rd.Dataset:
    return rd.from_arrow(
        pa.table({"doc_id": ["a", "b", "c"], "text": ["x y", "y", "z z z"]})
    )


def _make_tokenize():
    def tokenize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.add(pc.count_substring(t["text"], " "), 1)
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return tokenize


def _make_scale():
    class Scale:
        """Stateful stage: factor 'loads' in __init__ (actor-pool shape)."""

        def __init__(self, factor: int):
            self.factor = factor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "scaled": (df["n_tokens"] * self.factor).astype(np.int64),
                }
            )

    return Scale


def test_compose_runs_stateless_and_stateful():
    stages = [
        Stage(
            "tokenize",
            _make_tokenize(),
            schema_in=("doc_id", "text"),
            schema_out=("doc_id", "n_tokens"),
        ),
        Stage(
            "scale",
            _make_scale(),
            schema_in=("doc_id", "n_tokens"),
            schema_out=("doc_id", "scaled"),
            batch_format="pandas",
            fn_constructor_args=(10,),
            concurrency=(1, 2),
        ),
    ]
    out = build_pipeline(_source(), stages).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["scaled"]) == [20, 10, 30]


def test_compose_input_contract_violation_names_stage():
    stages = [
        Stage(
            "needs_missing", _make_tokenize(), schema_in=("doc_id", "absent_col")
        )
    ]
    with pytest.raises(Exception, match="needs_missing.*absent_col"):
        build_pipeline(_source(), stages).materialize()


def test_compose_output_contract_violation_names_stage():
    stages = [
        Stage(
            "tokenize",
            _make_tokenize(),
            schema_in=("doc_id", "text"),
            schema_out=("doc_id", "not_produced"),
        )
    ]
    with pytest.raises(Exception, match="tokenize.*not_produced"):
        build_pipeline(_source(), stages).materialize()


def test_compose_stateful_contract_violation_names_stage():
    stages = [
        Stage(
            "scale",
            _make_scale(),
            schema_in=("doc_id", "n_tokens"),  # source lacks n_tokens
            batch_format="pandas",
            fn_constructor_args=(10,),
            concurrency=1,
        )
    ]
    with pytest.raises(Exception, match="scale.*n_tokens"):
        build_pipeline(_source(), stages).materialize()


def test_compose_rejects_duplicate_names():
    with pytest.raises(ValueError, match="duplicate"):
        build_pipeline(
            _source(),
            [Stage("a", _make_tokenize()), Stage("a", _make_tokenize())],
        )


def test_pipeline_lineage_shape():
    stages = [
        Stage("tokenize", _make_tokenize(), schema_in=("doc_id", "text")),
        Stage("scale", _make_scale(), batch_format="pandas"),
    ]
    lin = pipeline_lineage(stages)
    assert [s["name"] for s in lin] == ["tokenize", "scale"]
    assert lin[0]["stateful"] is False and lin[1]["stateful"] is True
    import json

    json.dumps(lin)  # must be serializable for checkpoint manifests
