"""Invariant tests for the r4z operator batch: soft-dedup sampling
weights, mergeable log2 quantile sketch, RAKE keyphrase extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_dedup_weights_mass_per_cluster_is_bounded():
    from snomed_ct_entity_linking_ray.pipelines.dedup import (
        q_dedup_weights,
        q_dup_clusters,
    )

    out = q_dedup_weights(SF).to_pandas()
    labels = q_dup_clusters(SF).to_pandas()
    assert len(out) == len(labels)
    m = out.merge(labels, on="doc_id")
    sz = m.groupby("cluster_id")["doc_id"].size()
    # reported cluster_size is the true component size
    chk = m.groupby("cluster_id")["cluster_size"].first()
    assert (sz == chk).all()
    assert (m["weight_micro"] == 1_000_000 // m["cluster_size"]).all()
    # singletons keep full weight; every cluster's total mass <= 1e6
    singles = m[m["cluster_size"] == 1]
    assert (singles["weight_micro"] == 1_000_000).all()
    mass = m.groupby("cluster_id")["weight_micro"].sum()
    assert (mass <= 1_000_000).all()


def test_quantile_sketch_bounds_the_exact_quantiles():
    from snomed_ct_entity_linking_ray.pipelines.relational import (
        q_quantile_sketch,
    )

    out = q_quantile_sketch(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["cents"] = np.rint(ev["value"].to_numpy(np.float64) * 100).astype(np.int64)
    for _, r in out.iterrows():
        vals = np.sort(ev.loc[ev["event_type"] == r["event_type"], "cents"])
        p50 = vals[(len(vals) - 1) // 2]
        p90 = vals[min(len(vals) - 1, int(np.ceil(0.9 * len(vals))) - 1)]
        # one-sided bound: lb <= exact quantile < 2*lb (power-of-two bracket)
        assert r["p50_lb"] <= p50 < 2 * max(r["p50_lb"], 1)
        assert r["p90_lb"] <= p90 < 2 * max(r["p90_lb"], 1)


def test_rake_phrases_contract():
    from snomed_ct_entity_linking_ray.pipelines.text import (
        STOPWORDS,
        q_rake_phrases,
    )

    out = q_rake_phrases(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    assert out["doc_id"].is_unique
    stop = set(STOPWORDS)
    for _, r in out.head(50).iterrows():
        words = r["phrase"].split()
        assert words and not (set(words) & stop)
        # the phrase is a contiguous stopword-free run of the doc
        toks = text_of[r["doc_id"]].split()
        joined = " ".join(toks)
        assert r["phrase"] in joined
        assert r["score_micro"] >= 1_000_000 * len(words)  # deg>=freq

    # hand-built sanity: brute-force one doc and compare the top phrase
    did = int(out["doc_id"].iloc[0])
    toks = text_of[did].split()
    phrases, cur = [], []
    for w in toks:
        if w in stop:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(w)
    if cur:
        phrases.append(cur)
    freq: dict = {}
    deg: dict = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    best = min(
        ((-sum((deg[w] * 1_000_000) // freq[w] for w in ph), " ".join(ph))
         for ph in phrases)
    )
    row = out[out["doc_id"] == did].iloc[0]
    assert row["phrase"] == best[1] and int(row["score_micro"]) == -best[0]
