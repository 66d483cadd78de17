"""Invariant tests for q_match_explain (the per-pair Fellegi-Sunter
waterfall): the explanation must be consistent with the decision rule
it explains."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_match_explain_two_rows_per_pair_consistent_with_classify():
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_match_classify,
        q_match_explain,
    )

    exp = q_match_explain(SF).to_pandas()
    cls = q_match_classify(SF).to_pandas()
    assert len(exp) == 2 * len(cls)
    # each pair appears exactly once per field
    per = exp.groupby(["p_partkey_a", "p_partkey_b", "field"]).size()
    assert (per == 1).all()
    # agreement bits match the classify output
    piv = exp.pivot_table(index=["p_partkey_a", "p_partkey_b"],
                          columns="field", values="agree").reset_index()
    m = cls.merge(piv, on=["p_partkey_a", "p_partkey_b"])
    assert (m["agree_name"] == m["name"]).all()
    assert (m["agree_size"] == m["size"]).all()


def test_match_explain_weight_product_tracks_decision():
    """Product of the per-field micro weights vs 10^12 must agree with
    the exact integer decision on all but quantization-boundary pairs —
    and on the fixture there are no boundary pairs (asserted by equal
    verdicts)."""
    from snomed_ct_entity_linking_ray.pipelines.er import (
        q_match_classify,
        q_match_explain,
    )

    exp = q_match_explain(SF).to_pandas()
    cls = q_match_classify(SF).to_pandas()
    w = exp.pivot_table(index=["p_partkey_a", "p_partkey_b"],
                        columns="field", values="wt_micro").reset_index()
    m = cls.merge(w, on=["p_partkey_a", "p_partkey_b"])
    # Python-int products: two micro-weights can exceed int64 when a
    # field's likelihood ratio is large (the capped-weight regime)
    prod = [int(a) * int(b) for a, b in zip(m["name"], m["size"])]
    approx = np.array([int(p >= 10**12) for p in prod], dtype=np.int64)
    agree_rate = (approx == m["is_match"]).mean()
    assert agree_rate == 1.0, agree_rate


def test_match_explain_only_four_distinct_weights():
    """The m/u model has 2 fields x agree/disagree -> at most 4 distinct
    weight values across the whole output (the broadcast-table shape)."""
    from snomed_ct_entity_linking_ray.pipelines.er import q_match_explain

    exp = q_match_explain(SF).to_pandas()
    assert exp.groupby("field")["wt_micro"].nunique().le(2).all()
