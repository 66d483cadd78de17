"""Text-analysis operator family over the ``documents`` table.

Engine additions for large-scale training-data pipelines (per the build
brief): corpus statistics (the reference's G1 word count,
1st Place/src/mimic_train.py:477-479), quality scoring, token counting,
content fingerprinting, language ID heuristic, and first-occurrence
dictionary matching (M4-lite; the full word-bounded automaton path is the
entity-linking pipeline's blocking stage).

All hot paths are vectorized (pyarrow.compute / pandas str); DuckDB oracles
in ``__ray_entry__.oracle_sql`` check everything except langid (heuristic
argmax, still deterministic — rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import md5_hex
from ..functions.text import TOKEN_PATTERN
from .common import broadcast, default_buckets, grouped_sums, read

# The corpus vocabulary is lowercase space-separated words; these literal
# dictionaries are shared with the oracle SQL (inlined there as VALUES).
MATCH_TERMS = ["spark", "join", "window", "merge", "stream", "vector"]
STOPWORDS = ["the", "a", "fast", "slow"]
LANG_MARKERS = {
    "en": ["the", "fast"],
    "fr": ["table", "part"],
    "es": ["data", "row"],
    "de": ["hash", "merge"],
    "zh": ["spark", "batch"],
}


def q_unigrams(sf_dir: str):
    """G1 corpus unigram count: flat_map words → partial count per batch →
    final groupby-sum (the combine pattern; the shuffle moves one row per
    distinct word per batch, not one per token)."""
    ds = read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy().astype(np.int64)})

    p = ds.map_batches(partial, batch_format="pandas")
    return grouped_sums(p, ["word"], sums={"n": "n"})


def q_doc_stats(sf_dir: str):
    """Per-doc quality stats — all exact integers."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # all-C kernels (ADVICE r2: no per-row lambdas): split(" ") always
        # yields n_spaces+1 parts (empties included) and word chars are
        # n_chars - n_spaces, so both derive from str.count; stopword hits
        # via one explode + isin + grouped sum.
        df = df.reset_index(drop=True)
        n_chars = df["text"].str.len().astype(np.int64)
        n_spaces = df["text"].str.count(" ").astype(np.int64)
        ex = df["text"].str.split(" ").explode()
        n_stop = (
            ex.isin(STOPWORDS).groupby(level=0).sum().astype(np.int64)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_words": n_spaces + 1,
                "total_word_chars": n_chars - n_spaces,
                "n_stopwords": n_stop.reindex(df.index, fill_value=0).to_numpy(),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_token_count(sf_dir: str):
    """BPE-ish regex token count, vectorized via Arrow's RE2 kernel — the
    same regex engine family DuckDB uses, so counts match exactly."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        n = pc.count_substring_regex(low, pattern=TOKEN_PATTERN)
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    """Content fingerprint: md5 of the lowercased text (matches DuckDB md5).

    The winnowing rolling-hash fingerprint (functions.hashing.
    rolling_fingerprints) is exercised in pytest; md5 is the SQL-checkable
    exact-content fingerprint used by exact dedup at scale."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": [md5_hex(t.lower()) for t in df["text"]],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


PROMPT_SYS = (
    "Extract all clinical entity mentions from the passage "
    "and wrap each in <t></t> tags."
)
PROMPT_CHUNK_TOKENS = 100


def q_llm_prompts(sf_dir: str):
    """M22 LLM prompt formatter (reference: 3rd Place/src/
    snomedctentitylinking.py:284-293 '[INST] sys + chunk [/INST]' template
    over 100-token section chunks, document.py:281-311).

    Re-expressed Ray-Data-first: one flat_map-style ``map_batches`` that
    token-windows each doc (M14 semantics, whitespace tokens, 100/window)
    and emits one prompt row per chunk — the stage that would feed the A5
    generator actor pool. Explode + groupby-join keeps the chunk assembly
    in pandas C kernels; the prompt concat is a vectorized str op."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].str.split(" ")
        lens = s.str.len().to_numpy()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        tok = np.concatenate([np.arange(n) for n in lens]) if len(df) else np.array([], dtype=np.int64)
        ex = pd.DataFrame(
            {
                "doc_id": doc,
                "chunk_id": (tok // PROMPT_CHUNK_TOKENS).astype(np.int64),
                "w": s.explode().to_numpy(),
            }
        )
        g = ex.groupby(["doc_id", "chunk_id"], sort=False)
        out = g["w"].agg(" ".join).reset_index(name="chunk")
        out["n_tokens"] = g.size().to_numpy().astype(np.int64)
        out["prompt"] = "[INST] " + PROMPT_SYS + "\n" + out["chunk"] + " [/INST]"
        return out[["doc_id", "chunk_id", "prompt", "n_tokens"]]

    return ds.map_batches(fn, batch_format="pandas")


def q_term_match_first(sf_dir: str):
    """M4-lite dictionary match: first occurrence (substring semantics, like
    SQL strpos) of each MATCH_TERMS entry per doc; 0-based char offset."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for term in MATCH_TERMS:
            pos = df["text"].str.find(term)
            hit = pos >= 0
            if hit.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id": df["doc_id"][hit],
                            "term": term,
                            "start": pos[hit].astype(np.int64),
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=df["doc_id"].dtype),
                                 "term": pd.Series([], dtype=str),
                                 "start": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(fn, batch_format="pandas")


def q_langid(sf_dir: str):
    """Language-ID heuristic: argmax of marker-word counts, deterministic
    tiebreak by language code; 'und' when no marker hits. (Driver check is
    rows-only; exactness is covered by test_text_pipelines.)"""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    langs = sorted(LANG_MARKERS)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized (ADVICE r2: no per-doc Counter): one explode, then per
        # lang an isin + grouped sum — all pandas C kernels
        df = df.reset_index(drop=True)
        scores = np.zeros((len(df), len(langs)), dtype=np.int64)
        ex = df["text"].str.split(" ").explode()
        for j, lang in enumerate(langs):
            hits = ex.isin(LANG_MARKERS[lang]).groupby(level=0).sum()
            scores[:, j] = hits.reindex(df.index, fill_value=0).to_numpy()
        best = scores.argmax(axis=1)
        pred = np.array(langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": pred})

    return ds.map_batches(fn, batch_format="pandas")


# Per-mille keep rates for deterministic stratified sampling, by language.
# Shared with the oracle SQL (inlined there as a CASE expression).
SAMPLE_RATES_PERMILLE = {"en": 200, "fr": 500, "es": 500, "de": 800, "zh": 1000}


def q_doc_freq(sf_dir: str):
    """Inverted-index document frequency: exact COUNT(DISTINCT doc_id) per
    word — the df side of TF-IDF/BM25 and a distinct-count-per-key pattern
    the plain ``grouped_sums`` combine can't express (distinctness is not
    sum-decomposable).

    Scale shape: per-batch drop_duplicates collapses each batch to its
    distinct (word, doc_id) pairs (bounded by per-doc vocabulary, not token
    count), then ONE shuffle bucketed by hash(word) so every pair of a word
    lands in the same bucket task, where a second vectorized dedup + sized
    groupby emits (word, df). Per-bucket memory ≈ distinct_pairs/n_buckets;
    n_buckets scales with the cluster (``default_buckets``)."""
    from .common import default_buckets

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].str.split(" ").explode()
        g = (
            ex.reset_index()
            .rename(columns={"text": "word"})
            .drop_duplicates()
        )
        h = pd.util.hash_pandas_object(g["word"], index=False).to_numpy()
        g["_wb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=["word", "doc_id"])
        vc = d.groupby("word", sort=False).size()
        return pd.DataFrame(
            {"word": vc.index, "df": vc.to_numpy().astype(np.int64)}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_wb")
        .map_groups(combine, batch_format="pandas")
    )


def q_len_quantiles(
    sf_dir: str, quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
):
    """Distributed exact quantiles of ``n_chars`` via a value-count
    histogram: per-batch value_counts partials, bucketed combine
    (``grouped_sums``), then the BOUNDED histogram — one row per distinct
    length, not per doc — collects to the driver for the cumulative-count
    walk. percentile_disc semantics (verified against DuckDB): smallest v
    with cum_count >= max(1, ceil(q*N)).

    Partitioning assumption: distinct-value cardinality is driver-sized
    (true for integer lengths/scores; pre-bucket continuous values into
    fixed-width bins first — the histogram shuffle itself scales, only the
    final walk is driver-side)."""
    ds = read(sf_dir, "documents", ["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n_chars"].value_counts()
        return pd.DataFrame(
            {
                "n_chars": vc.index.to_numpy().astype(np.int64),
                "n": vc.to_numpy().astype(np.int64),
            }
        )

    hist = (
        grouped_sums(ds.map_batches(partial, batch_format="pandas"),
                     ["n_chars"], sums={"n": "n"})
        .sort("n_chars")
        .to_pandas()
    )
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    vals = hist["n_chars"].to_numpy()
    rows = []
    for q in quantiles:
        k = max(1, int(np.ceil(q * total)))
        idx = int(np.searchsorted(cum, k, side="left"))
        rows.append((float(q), int(vals[idx])))
    return pd.DataFrame(rows, columns=["q", "n_chars"]).astype(
        {"q": np.float64, "n_chars": np.int64}
    )


def q_sample_stratified(sf_dir: str):
    """Deterministic per-stratum hash sampling — the resumable, cluster-
    stable way to downsample a 100 TB corpus (no RNG state, no reservoir:
    re-running any partition reproduces the same sample; rates vary by
    stratum). Keep doc iff mix(doc_id) per-mille < rate[lang], where
    mix(i) = ((i % 1000003) * 2654435761) % 1000000007 — all intermediates
    < 2^51 so the same arithmetic is exact in SQL BIGINT and int64 numpy.
    Embarrassingly parallel: a pruned-column filter, no shuffle."""
    ds = read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = ((ids % 1000003) * 2654435761) % 1000000007 % 1000
        rate = df["lang"].map(SAMPLE_RATES_PERMILLE).fillna(0).to_numpy(np.int64)
        return df[h < rate]

    return ds.map_batches(fn, batch_format="pandas")


# BM25 constants (Robertson et al.; Lucene defaults) — shared with the
# independent oracle (oracles.py::_bm25_topk).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = MATCH_TERMS  # fixed term order: idf accumulation sequence


def q_bm25_topk(sf_dir: str, k: int = 10):
    """BM25 top-k document retrieval for a fixed query — the ranking
    composite of the text family: one streaming stats pass (N, total
    tokens, per-term document frequency — a single-row combine, no
    shuffle), driver-side idf (math.log on exact integer df), then a
    broadcast-scored pass with per-batch partial top-k and a tiny final
    combine (the ``cosine_topk`` discipline).

    Determinism contract (hash-green vs oracles.py::_bm25_topk): idf/avgdl
    are computed ONCE on the driver from exact integers; per-doc scoring is
    elementwise IEEE mul/div/add accumulated in fixed BM25_QUERY order, so
    engine (numpy) and oracle (scalar Python) are bit-identical; ranking
    uses the 1e-9-quantized integer score."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    terms = list(BM25_QUERY)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].str.split(" ").explode()
        row = {
            "n_docs": np.int64(len(df)),
            "n_tokens": np.int64(len(ex)),
        }
        for t in terms:
            row[f"df_{t}"] = np.int64(ex.eq(t).groupby(level=0).any().sum())
        return pd.DataFrame([row])

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .to_pandas()  # one tiny row per batch
        .sum()
    )
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["n_tokens"]) / n_docs  # one driver-side division
    import math

    idf = {
        t: math.log(
            (n_docs - int(stats[f"df_{t}"]) + 0.5)
            / (int(stats[f"df_{t}"]) + 0.5)
            + 1.0
        )
        for t in terms
    }
    ref = broadcast((terms, idf, avgdl))

    class ScoreTopK:
        def __init__(self):
            self.terms, self.idf, self.avgdl = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            ex = df["text"].str.split(" ").explode()
            dl = ex.groupby(level=0).size().reindex(df.index, fill_value=0)
            dl = dl.to_numpy(np.float64)
            norm = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / self.avgdl))
            score = np.zeros(len(df), dtype=np.float64)
            for t in self.terms:  # fixed accumulation order (contract)
                tf = (
                    ex.eq(t)
                    .groupby(level=0)
                    .sum()
                    .reindex(df.index, fill_value=0)
                    .to_numpy(np.float64)
                )
                score = score + self.idf[t] * (
                    tf * (BM25_K1 + 1.0) / (tf + norm)
                )
            score_q = np.rint(score * 1e9).astype(np.int64)
            out = pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(np.int64), "score_q": score_q}
            )
            # batch-local partial top-k (quantized score, doc_id tiebreak)
            out = out.sort_values(
                ["score_q", "doc_id"], ascending=[False, True]
            ).head(k)
            return out

    partial = ds.map_batches(ScoreTopK, batch_format="pandas", concurrency=(1, 4))
    final = (
        partial.to_pandas()  # <= k rows per batch
        .sort_values(["score_q", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return final


REDACT_TERMS = ["spark", "merge"]  # shared with the oracle SQL regex


def q_redact_terms(sf_dir: str):
    """PII-scrub-shaped redaction: replace every word-bounded occurrence of
    the blacklist terms with the ``<RED>`` placeholder and count the
    redactions per doc. The regex is compiled once per process by pandas'
    C-backed str kernels; the pattern class (word-bounded alternation) is
    the exact shape a real email/phone scrubber uses — the corpus here is
    synthetic words, so the blacklist plays the PII-pattern role."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    pat = r"\b(" + "|".join(REDACT_TERMS) + r")\b"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "clean_text": df["text"].str.replace(pat, "<RED>", regex=True),
                "n_redacted": df["text"].str.count(pat).astype(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_quality_filter(sf_dir: str):
    """C4/Gopher-style rule-stack document filter: keep docs with
    20 <= n_words <= 80, stopword ratio >= 10%, and mean word length
    <= 4.8 chars. Every predicate is CROSS-MULTIPLIED INTEGER arithmetic
    (n_stopwords*10 >= n_words etc.) so no float ever crosses the oracle
    boundary; signals ride along for downstream mixing decisions.
    Embarrassingly parallel — one vectorized map_batches, no shuffle."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        n_chars = df["text"].str.len().astype(np.int64)
        n_spaces = df["text"].str.count(" ").astype(np.int64)
        n_words = (n_spaces + 1).to_numpy()
        wchars = (n_chars - n_spaces).to_numpy()
        ex = df["text"].str.split(" ").explode()
        n_stop = (
            ex.isin(STOPWORDS)
            .groupby(level=0)
            .sum()
            .astype(np.int64)
            .reindex(df.index, fill_value=0)
            .to_numpy()
        )
        keep = (
            (n_words >= 20)
            & (n_words <= 80)
            & (n_stop * 10 >= n_words)
            & (wchars * 10 <= n_words * 48)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                "n_words": n_words[keep],
                "n_stopwords": n_stop[keep],
                "total_word_chars": wchars[keep],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_bigram_lift(sf_dir: str, k: int = 20):
    """Collocation mining: top-k corpus bigrams by lift
    = n_ab * n_tokens / (n_a * n_b).

    Scale shape: bigram counts via the ``grouped_sums`` map-side combine
    (shuffle moves one row per distinct in-batch bigram); unigram counts
    are VOCABULARY-BOUNDED, so they collect once and broadcast as a
    lookup (the ``vocab_topk`` discipline — a join would move the
    corpus-sized bigram table instead). The lift score is one double
    expression, (n_ab·T)/(n_a·n_b), identical IEEE evaluation order in
    both engines; counts stay int64 so ranking ties break exactly."""
    ds = read(sf_dir, "documents", ["text"])

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy().astype(np.int64)})

    uni = grouped_sums(
        ds.map_batches(uni_partial, batch_format="pandas"), ["word"], sums={"n": "n"}
    ).to_pandas()  # vocabulary-bounded
    n_total = int(uni["n"].sum())
    uni_ref = broadcast(dict(zip(uni["word"], uni["n"].astype(np.int64))))

    def bg_partial(df: pd.DataFrame) -> pd.DataFrame:
        w1s: list[np.ndarray] = []
        w2s: list[np.ndarray] = []
        for t in df["text"]:
            ws = np.array(t.split(" "), dtype=object)
            if len(ws) > 1:
                w1s.append(ws[:-1])
                w2s.append(ws[1:])
        if not w1s:
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
                 "n_ab": pd.Series([], dtype=np.int64)}
            )
        g = pd.DataFrame({"w1": np.concatenate(w1s), "w2": np.concatenate(w2s)})
        g = g.groupby(["w1", "w2"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "n_ab"}).astype({"n_ab": np.int64})

    bg = grouped_sums(
        ds.map_batches(bg_partial, batch_format="pandas"), ["w1", "w2"],
        sums={"n_ab": "n_ab"},
    )

    class Score:
        def __init__(self):
            self.uni = ray.get(uni_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
                     "n_ab": pd.Series([], dtype=np.int64),
                     "n_a": pd.Series([], dtype=np.int64),
                     "n_b": pd.Series([], dtype=np.int64),
                     "lift": pd.Series([], dtype=np.float64)}
                )
            n_a = df["w1"].map(self.uni).to_numpy(np.int64)
            n_b = df["w2"].map(self.uni).to_numpy(np.int64)
            n_ab = df["n_ab"].to_numpy(np.int64)
            lift = (n_ab.astype(np.float64) * np.float64(n_total)) / (
                n_a.astype(np.float64) * n_b.astype(np.float64)
            )
            out = pd.DataFrame(
                {"w1": df["w1"], "w2": df["w2"], "n_ab": n_ab,
                 "n_a": n_a, "n_b": n_b, "lift": lift}
            )
            # map-side partial top-k bounds the final sort at k rows/batch
            return out.sort_values(
                ["lift", "w1", "w2"], ascending=[False, True, True]
            ).head(k)

    return (
        bg.map_batches(Score, batch_format="pandas", concurrency=(1, 4))
        .sort(["lift", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def q_posting_lists(sf_dir: str):
    """Inverted-index build: per term, document frequency + the sorted
    posting list (comma-joined doc_ids — a string column so the oracle
    compare is exact; a real index sink would keep the int64 list).

    Scale shape: a doc lives in exactly one batch, so the per-batch
    DISTINCT (term, doc_id) combine is globally duplicate-free; the
    shuffle carries those slim pairs hash-bucketed by term, and each
    bucket assembles its vocabulary-bounded slice of the index with one
    sort + C-level groupby-join. The assembled index is
    vocabulary-bounded, never corpus-bounded."""
    from .common import default_buckets

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = default_buckets()

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        w = df.set_index("doc_id")["text"].str.split(" ").explode()
        p = w.reset_index().drop_duplicates()
        p.columns = ["doc_id", "term"]
        h = pd.util.hash_pandas_object(p["term"], index=False).to_numpy()
        p["_tb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return p

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"])
        g["s"] = g["doc_id"].astype(str)
        agg = g.groupby("term", sort=True).agg(
            df=("doc_id", "size"), postings=("s", ",".join)
        )
        return pd.DataFrame(
            {
                "term": agg.index.to_numpy(object),
                "df": agg["df"].to_numpy(np.int64),
                "postings": agg["postings"].to_numpy(object),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("_tb")
        .map_groups(assemble, batch_format="pandas")
    )


def q_token_diversity(sf_dir: str):
    """Per-doc lexical diversity (type-token ratio) — the vocabulary-
    richness quality signal used alongside repetition stats in web-corpus
    filtering (Gopher-family rules penalize low-TTR boilerplate). Token =
    maximal [a-z0-9] run of the lowercased text, so Arrow's regex split
    and DuckDB's regexp_split_to_array agree on the non-empty pieces by
    construction (empty split artifacts are filtered on both sides).

    Fully vectorized, zero-copy per batch: pyarrow split_pattern_regex →
    list_flatten + list_parent_indices, one hash drop_duplicates for the
    per-doc distinct count, np.bincount for totals — no per-row Python.
    ttr is ONE division of two exact int64s (0.0 for token-less docs),
    matching the oracle expression bit-exactly. Streams: one map_batches,
    no shuffle, output one row per input row."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        low = pc.utf8_lower(t["text"])
        lists = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        toks = pc.filter(flat, keep).to_pandas()
        idx = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
        n_tokens = np.bincount(idx, minlength=n_rows).astype(np.int64)
        dd = pd.DataFrame({"i": idx, "t": toks}).drop_duplicates()
        n_distinct = np.bincount(
            dd["i"].to_numpy(), minlength=n_rows
        ).astype(np.int64)
        ttr = np.zeros(n_rows, dtype=np.float64)
        nz = n_tokens > 0
        ttr[nz] = n_distinct[nz].astype(np.float64) / n_tokens[nz].astype(
            np.float64
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "ttr": pa.array(ttr, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _disc_quantiles_int(ds, col: str, qs: tuple[float, ...]) -> list[int]:
    """Exact percentile_disc over a driver-bounded-cardinality int column:
    per-batch value_counts partials → bucketed grouped_sums combine → the
    BOUNDED histogram (one row per distinct value) walks cumulative counts
    on the driver. Same machinery/semantics as q_len_quantiles (smallest v
    with cum_count >= max(1, ceil(q*N)), verified vs DuckDB
    quantile_disc); shared here so filters can consume the thresholds."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()
        return pd.DataFrame(
            {
                col: vc.index.to_numpy().astype(np.int64),
                "n": vc.to_numpy().astype(np.int64),
            }
        )

    hist = (
        grouped_sums(ds.map_batches(partial, batch_format="pandas"),
                     [col], sums={"n": "n"})
        .sort(col)
        .to_pandas()
    )
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    vals = hist[col].to_numpy()
    out = []
    for q in qs:
        k = max(1, int(np.ceil(q * total)))
        out.append(int(vals[int(np.searchsorted(cum, k, side="left"))]))
    return out


def q_length_band_filter(sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95):
    """Outlier-length document filter — drop the shortest/longest tails by
    GLOBAL exact percentiles (the standard corpus-prep step: truncated or
    concatenated crawl artifacts live in the length tails). Two passes:
    (1) the bounded value-count histogram yields exact percentile_disc
    thresholds (never a per-doc collect), (2) a predicate-pushdown filter
    streams the corpus through `n_chars BETWEEN lo AND hi` — the
    thresholds are two ints baked into the filter expression, so nothing
    is broadcast and no shuffle occurs. Resumable: both passes are
    deterministic functions of the input."""
    stats = read(sf_dir, "documents", ["n_chars"])
    lo, hi = _disc_quantiles_int(stats, "n_chars", (q_lo, q_hi))
    docs = read(sf_dir, "documents", ["doc_id", "n_chars"])
    return docs.filter(expr=f"n_chars >= {lo} and n_chars <= {hi}")


def q_length_cdf(sf_dir: str):
    """Distribution-rank window (SQL ``cume_dist() OVER (ORDER BY
    n_chars)``) for every document — the percentile-rank signal corpus
    curricula sort on (length percentile as a difficulty proxy). A global
    ORDER-BY window normally forces a total sort; here the value domain is
    bounded, so ONE value-count histogram pass (the len_quantiles
    machinery) collects to a driver-bounded table, its cumulative counts
    broadcast once, and a second streamed pass resolves every row's rank
    by vectorized searchsorted — zero shuffle, no sort, no per-doc
    collect. cume_dist = (rows with value <= mine) / N: ONE division of
    exact int64s per row, formed identically to the SQL definition, so
    the compare is bit-exact."""
    stats = read(sf_dir, "documents", ["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n_chars"].value_counts()
        return pd.DataFrame(
            {
                "n_chars": vc.index.to_numpy().astype(np.int64),
                "n": vc.to_numpy().astype(np.int64),
            }
        )

    hist = (
        grouped_sums(stats.map_batches(partial, batch_format="pandas"),
                     ["n_chars"], sums={"n": "n"})
        .sort("n_chars")
        .to_pandas()
    )
    vals = hist["n_chars"].to_numpy(np.int64)
    cum = hist["n"].cumsum().to_numpy(np.int64)
    total = int(cum[-1]) if len(cum) else 0
    cdf_ref = broadcast((vals, cum))

    class Cdf:
        def __init__(self):
            self.vals, self.cum = ray.get(cdf_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            x = df["n_chars"].to_numpy(np.int64)
            le = self.cum[np.searchsorted(self.vals, x, side="right") - 1]
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "n_chars": x,
                    "cdf": le.astype(np.float64) / np.float64(total),
                }
            )

    docs = read(sf_dir, "documents", ["doc_id", "n_chars"])
    return docs.map_batches(Cdf, batch_format="pandas", concurrency=(1, 8))


def q_oov_rate(sf_dir: str, k: int = 16):
    """Out-of-vocabulary rate per document — the vocabulary-coverage
    quality signal tokenizer-fit audits use (what fraction of a doc's
    tokens fall outside the top-``k`` corpus vocabulary; docs dominated by
    tail tokens are flagged for review or re-tokenization). Two streamed
    passes over the corpus, the q_bm25/q_decontaminate discipline:

    1. corpus token counts via the per-batch-partial + ``grouped_sums``
       combine (shuffle carries one row per distinct token per batch,
       vocabulary-bounded); the top-k (count DESC, token ASC — the
       deterministic tie-break, same as the oracle's ORDER BY) collects
       driver-side as k strings and broadcasts ONCE via ``ray.put``;
    2. one map_batches resolves every doc: vectorized split + isin +
       bincount. n_tokens / n_oov are exact int64; oov_rate is ONE
       division formed identically to the oracle expression.
    """
    ds = read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy().astype(np.int64)})

    counts = grouped_sums(
        ds.map_batches(partial, batch_format="pandas"), ["word"], sums={"n": "n"}
    ).to_pandas()
    vocab = (
        counts.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        .head(k)["word"]
        .tolist()
    )
    vocab_ref = broadcast(frozenset(vocab))

    class Oov:
        def __init__(self):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            n_rows = len(df)
            ex = df["text"].str.split(" ").explode()
            ex = ex[ex != ""]
            idx = ex.index.to_numpy()
            n_tokens = np.bincount(idx, minlength=n_rows).astype(np.int64)
            oov = ~ex.isin(self.vocab).to_numpy()
            n_oov = np.bincount(idx[oov], minlength=n_rows).astype(np.int64)
            rate = np.zeros(n_rows, dtype=np.float64)
            nz = n_tokens > 0
            rate[nz] = n_oov[nz].astype(np.float64) / n_tokens[nz].astype(np.float64)
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "n_tokens": n_tokens,
                    "n_oov": n_oov,
                    "oov_rate": rate,
                }
            )

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(Oov, batch_format="pandas", concurrency=(1, 8))


def q_freq_of_freqs(sf_dir: str):
    """Good-Turing frequency-of-frequencies table: for each corpus token
    frequency r, the number of distinct token types occurring exactly r
    times — the N_r table smoothing estimators (Good-Turing, Katz) are
    built from, and the standard first diagnostic of a corpus's Zipf
    tail. Two bounded reductions: the unigram ``grouped_sums`` combine
    (shuffle carries one row per distinct token per batch), then a
    second grouped count over the token-count table, whose output is
    bounded by the number of DISTINCT frequencies (<= O(sqrt(total
    tokens)) by a counting argument — tiny at any scale)."""
    ds = read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy().astype(np.int64)})

    counts = grouped_sums(
        ds.map_batches(partial, batch_format="pandas"), ["word"], sums={"n": "n"}
    )

    def as_freq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"freq": df["n"].to_numpy(np.int64)})

    return grouped_sums(
        counts.map_batches(as_freq, batch_format="pandas"),
        ["freq"],
        sums={},
        count_as="n_types",
    )


def q_char_entropy(sf_dir: str):
    """Per-document character-distribution Shannon entropy in integer
    nano-nats — the cheap randomness/quality signal a training-data
    pipeline uses to drop boilerplate (near-zero entropy) and binary
    garbage (near-log|alphabet| entropy) before heavier scoring (the
    Gopher-rules companion to q_repetition_stats).

    Vectorized shape: a batch's texts are concatenated ONCE and decoded
    to a uint32 codepoint array (no per-row Python); per-(doc, char)
    counts come from one ``np.unique`` over a composite int64 key; each
    count's entropy term is quantized to int64 nano-nats BEFORE the
    per-doc sum (``np.add.at``), so the result is bit-identical however
    the docs are batched — the accumulation-order discipline of
    q_bm25_topk. Shuffle-free: one row per doc rides to the sink.

    Oracle: independent single-process numpy implementation
    (oracles._char_entropy) — identical quantization contract, no SQL ln()
    because DuckDB's round-half-away vs numpy's rint would diverge on the
    grid boundary."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "entropy_nnats": pd.Series([], dtype=np.int64)}
            )
        texts = df["text"].astype(str).tolist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        codes = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        key = doc_idx * (np.int64(1) << 32) + codes.astype(np.int64)
        uk, counts = np.unique(key, return_counts=True)
        u_doc = (uk >> 32).astype(np.int64)
        n = np.maximum(lens[u_doc], 1).astype(np.float64)
        p = counts.astype(np.float64) / n
        terms = np.rint(-p * np.log(p) * 1e9).astype(np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        np.add.at(out, u_doc, terms)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "entropy_nnats": out}
        )

    return ds.map_batches(entropy, batch_format="pandas")


def q_lm_perplexity(sf_dir: str):
    """Bigram-LM negative log-likelihood per document — the CCNet-style
    quality signal (Wenzek et al. '20 filter web text by LM perplexity;
    here the LM is trained on the corpus itself in the same job): pass 1
    counts corpus unigrams and bigrams (``grouped_sums`` partials — the
    shuffle carries one row per distinct gram per batch, vocabulary-
    bounded); the model broadcasts ONCE (add-one smoothing,
    p(w|v) = (c(v,w)+1)/(c(v)+V)); pass 2 scores each doc's bigrams in a
    vectorized lookup.

    Integer contract: each bigram term quantizes to int64 micro-nats
    BEFORE the per-doc sum (the q_char_entropy discipline), so results
    are bit-identical across batch layouts and vs the single-process
    oracle (log of a ratio of exact ints is the same float64 on both
    sides)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].astype(str).str.split().explode().dropna()
        doc_idx = ex.index.to_numpy()
        w = ex.to_numpy(object)
        uni = pd.Series(w).value_counts()
        same = doc_idx[1:] == doc_idx[:-1]
        bkeys = pd.Series(w[:-1][same]).astype(str) + " " + pd.Series(
            w[1:][same]
        ).astype(str)
        bi = bkeys.value_counts()
        return pd.DataFrame(
            {
                "gram": np.concatenate(
                    [uni.index.to_numpy(object), bi.index.to_numpy(object)]
                ),
                "is_bi": np.concatenate(
                    [np.zeros(len(uni), np.int64), np.ones(len(bi), np.int64)]
                ),
                "n": np.concatenate(
                    [uni.to_numpy(np.int64), bi.to_numpy(np.int64)]
                ),
            }
        )

    counts = grouped_sums(
        ds.map_batches(grams, batch_format="pandas"), ["gram", "is_bi"], {"n": "n"}
    ).to_pandas()
    uni = dict(
        zip(counts.loc[counts["is_bi"] == 0, "gram"],
            counts.loc[counts["is_bi"] == 0, "n"])
    )
    bi = dict(
        zip(counts.loc[counts["is_bi"] == 1, "gram"],
            counts.loc[counts["is_bi"] == 1, "n"])
    )
    V = len(uni)
    model_ref = broadcast((uni, bi, V))

    class Score:
        def __init__(self):
            self.uni, self.bi, self.V = ray.get(model_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            splits = df["text"].astype(str).str.split()
            ex = splits.explode().dropna()
            doc_idx = ex.index.to_numpy(np.int64)
            w = ex.to_numpy(object)
            same = (
                doc_idx[1:] == doc_idx[:-1]
                if len(w)
                else np.zeros(0, dtype=bool)
            )
            wa = pd.Series(w[:-1][same]) if len(w) else pd.Series([], dtype=object)
            wb = pd.Series(w[1:][same]) if len(w) else pd.Series([], dtype=object)
            c_bi = (
                (wa.astype(str) + " " + wb.astype(str))
                .map(self.bi)
                .fillna(0)
                .to_numpy(np.int64)
            )
            c_uni = wa.map(self.uni).fillna(0).to_numpy(np.int64)
            p = (c_bi + 1).astype(np.float64) / (c_uni + self.V).astype(np.float64)
            terms = np.rint(-np.log(p) * 1e6).astype(np.int64)
            nll = np.zeros(len(df), dtype=np.int64)
            np.add.at(nll, doc_idx[:-1][same] if len(w) else [], terms)
            nbi = np.maximum(splits.str.len().fillna(0).to_numpy(np.int64) - 1, 0)
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "nll_micro": nll,
                    "n_bigrams": nbi,
                }
            )

    return ds.map_batches(Score, batch_format="pandas", concurrency=(1, 4))


def q_top_words_per_lang(sf_dir: str, k: int = 5):
    """Grouped top-k vocabulary: the k most frequent words per language
    (count DESC, word ASC tie-break) — the per-stratum variant of
    q_vocab_topk a curation report runs per language/source. Per-batch
    (lang, word) partial counts bound the shuffle; the final per-lang
    top-k dispatches one group per LANGUAGE (dictionary-bounded, the
    q_top2_gap rationale)."""
    ds = read(sf_dir, "documents", ["lang", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].astype(str).str.split().explode().dropna()
        lang = df["lang"].astype(str).reindex(ex.index)
        g = pd.DataFrame({"lang": lang.to_numpy(object),
                          "word": ex.to_numpy(object)})
        out = g.groupby(["lang", "word"], as_index=False).size()
        out = out.rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    sums = grouped_sums(
        ds.map_batches(counts, batch_format="pandas"), ["lang", "word"], {"n": "n"}
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pd.DataFrame(
            {
                "lang": g["lang"].astype(str),
                "word": g["word"].astype(str),
                "n": g["n"].to_numpy(np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return sums.groupby("lang").map_groups(topk, batch_format="pandas")


def q_compression_ratio(sf_dir: str):
    """Compressibility quality signal: per-doc DEFLATE size (zlib level 6)
    next to the raw byte length — the near-free repetitiveness detector
    production filters run alongside Gopher rules (highly compressible =
    boilerplate/repetition; incompressible = binary noise). Integer
    contract: both columns are exact byte counts from the same public
    codec, so the oracle compare is bit-exact.

    Shape: embarrassingly parallel map, no shuffle; compression is the
    per-row kernel (CPU-bound C code — the md5-fingerprint rationale),
    batched through an actor pool."""
    import zlib

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def comp(df: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in df["text"].astype(str)]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "raw_bytes": np.fromiter(
                    (len(b) for b in raw), dtype=np.int64, count=len(raw)
                ),
                "deflate_bytes": np.fromiter(
                    (len(zlib.compress(b, 6)) for b in raw),
                    dtype=np.int64,
                    count=len(raw),
                ),
            }
        )

    return ds.map_batches(comp, batch_format="pandas")


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth curve: for every doc index at which
    NEW vocabulary first appears, the cumulative distinct-vocabulary
    size after that doc — the tokenizer-budget planning curve, at exact
    growth points (a tiny corpus saturates early; the exact-point form
    stays informative at any scale). Distributed as a FIRST-OCCURRENCE
    aggregation: one grouped MIN(doc_id) per word (partial mins per
    batch bound the shuffle), then a vocabulary-bounded histogram of
    first occurrences and a driver-side cumulative sum over its ≤
    |growth points| rows."""
    import ray.data as rd

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = default_buckets()

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].astype(str).str.split().explode().dropna()
        did = df["doc_id"].reindex(ex.index).to_numpy(np.int64)
        g = pd.DataFrame({"word": ex.to_numpy(object), "first_doc": did})
        out = g.groupby("word", as_index=False)["first_doc"].min()
        h = pd.util.hash_pandas_object(out["word"], index=False).to_numpy()
        out["_wb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", as_index=False)["first_doc"].min()
        return out.groupby("first_doc", as_index=False).size().rename(
            columns={"size": "n_new"}
        )

    hist = (
        ds.map_batches(first_seen, batch_format="pandas")
        .groupby("_wb")
        .map_groups(combine, batch_format="pandas")
    )
    folded = grouped_sums(hist, ["first_doc"], {"n_new": "n_new"}).to_pandas()
    folded = folded.sort_values("first_doc")
    out = pd.DataFrame(
        {
            "first_doc": folded["first_doc"].to_numpy(np.int64),
            "vocab_size": np.cumsum(folded["n_new"].to_numpy(np.int64)),
        }
    )
    return rd.from_pandas(out)


def q_rrf_fusion(sf_dir: str, k: int = 10, pool: int = 100, c: int = 60):
    """Reciprocal-rank fusion of two independent document rankers —
    relevance (BM25 over the fixed query) fused with the quality-classifier
    prior — the standard hybrid-retrieval combiner (Cormack et al. 2009):
    fused(d) = Σ_r 1/(c + rank_r(d)) over the rankers that retrieved d in
    their top-``pool``. This is the selection step a RAG / training-data
    pipeline runs after heterogeneous retrievers.

    Scale shape: each ranker already reduces to a driver-bounded top-pool
    list via per-batch partial top-k (the `cosine_topk` discipline), so the
    fusion itself touches ≤ 2·pool rows. Determinism: ranks are dense
    integers from exact int64-quantized scores with doc_id tiebreak; the
    fused double is the SAME two correctly-rounded divisions summed in the
    same order (BM25 term first) in both engines — bit-exact, no epsilon."""
    from .training import q_quality_score

    a = q_bm25_topk(sf_dir, k=pool)  # pandas: doc_id, score_q (rank order)
    a = a.reset_index(drop=True)
    rank_a = {int(d): i + 1 for i, d in enumerate(a["doc_id"])}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["score_q", "doc_id"], ascending=[False, True]
        ).head(pool)

    b = (
        q_quality_score(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # <= pool rows per block
        .sort_values(["score_q", "doc_id"], ascending=[False, True])
        .head(pool)
        .reset_index(drop=True)
    )
    rank_b = {int(d): i + 1 for i, d in enumerate(b["doc_id"])}

    cand = sorted(set(rank_a) | set(rank_b))
    ra = np.array([rank_a.get(d, 0) for d in cand], dtype=np.int64)
    rb = np.array([rank_b.get(d, 0) for d in cand], dtype=np.int64)
    fused = np.where(ra > 0, 1.0 / (c + ra), 0.0) + np.where(
        rb > 0, 1.0 / (c + rb), 0.0
    )
    out = pd.DataFrame(
        {
            "doc_id": np.array(cand, dtype=np.int64),
            "rank_bm25": ra,
            "rank_quality": rb,
            "rrf": fused,
        }
    )
    out = (
        out.sort_values(["rrf", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    import ray.data as rd

    return rd.from_pandas(out)


# --- overlapping sliding-window chunker (RAG ingestion) ----------------------

CHUNK_WIDTH = 200   # chars per chunk
CHUNK_STRIDE = 150  # chunk start spacing (overlap = width - stride = 50)


def q_chunk_overlap(sf_dir: str, width: int = CHUNK_WIDTH,
                    stride: int = CHUNK_STRIDE):
    """Overlapping sliding-window chunker — the RAG-ingestion shape (chunk
    width > stride so consecutive chunks share ``width - stride`` chars of
    context; the reference's chunkers are non-overlapping token windows,
    M14 `2nd Place/submission/infer.py:27-41` / M20
    `3rd Place/src/document.py:281-311` — retrieval corpora add the
    overlap so no answer span is ever split across a chunk boundary).

    Chunk starts are 0, stride, 2·stride, … < max(len, 1) (an empty doc
    still emits its one empty chunk, mirroring the oracle's
    ``range(0, greatest(len,1), stride)``); each row carries the exact
    char offset so downstream hits map back into the document.

    Scale shape: embarrassingly parallel flat-map — no shuffle, no state.
    The per-batch kernel loops over CHUNK ORDINALS (bounded by
    max-doc-len / stride, ~tens), never rows: ordinal k slices every doc
    that still has text at offset k·stride in one vectorized
    ``str.slice``."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "chunk_id", "start", "chunk_len", "chunk"]
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "chunk_id": pd.Series([], dtype=np.int64),
                 "start": pd.Series([], dtype=np.int64),
                 "chunk_len": pd.Series([], dtype=np.int64),
                 "chunk": pd.Series([], dtype=object)})[cols]
        txt = df["text"].astype(str)
        ids = df["doc_id"].to_numpy(np.int64)
        ln = txt.str.len().to_numpy(np.int64)
        # starts are 0..max(len,1)-1 step stride -> ordinal count per doc
        n_chunks = (np.maximum(ln, 1) - 1) // stride + 1
        out = []
        for k in range(int(n_chunks.max())):
            m = n_chunks > k
            start = k * stride
            sub = txt[m]
            out.append(pd.DataFrame({
                "doc_id": ids[m],
                "chunk_id": np.int64(k),
                "start": np.int64(start),
                "chunk_len": np.minimum(np.maximum(ln[m] - start, 0), width),
                "chunk": sub.str.slice(start, start + width).to_numpy(),
            }))
        return pd.concat(out, ignore_index=True)[cols]

    return ds.map_batches(fn, batch_format="pandas")


# --- data-mixture quota sampler ----------------------------------------------

MIX_BASE = 40   # per-source quota = MIX_BASE + MIX_STEP * (src_ordinal % MIX_MOD)
MIX_STEP = 30
MIX_MOD = 3


def q_mix_sources(sf_dir: str):
    """Data-MIXTURE sampler: every source contributes an explicit quota of
    documents (the LLM-pretraining "mixture weights" recipe — upsample
    curated sources, downsample bulk web — here a deterministic per-source
    quota derived from the source ordinal so the contract is expressible
    in both engines). Within a source the quota picks the docs with the
    smallest (mix(doc_id), doc_id) under the RNG-free integer mixer — the
    same resumable, cluster-stable ordering as ``q_sample_stratified``
    (rate-based) and ``q_sample_topk_hash`` (global top-k); this is the
    per-group-QUOTA member of the family.

    Output: (source, doc_id, rk, pos) with pos = 1-based rank within the
    source.

    Scale shape: per-batch partial top-quota per source (sort + cumcount
    mask bounds the exchange at quota rows per (source, batch)), then one
    ``groupby(source)`` finalize — the group count is the number of
    SOURCES (dictionary-bounded), so per-group dispatch is O(10), not
    O(corpus)."""
    ds = read(sf_dir, "documents", ["doc_id", "source"])
    max_quota = MIX_BASE + MIX_STEP * (MIX_MOD - 1)

    def _quota(src: pd.Series) -> np.ndarray:
        ordinal = src.str.slice(3).astype(np.int64)
        return (MIX_BASE + MIX_STEP * (ordinal % MIX_MOD)).to_numpy(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["source", "doc_id", "rk"]
        if len(df) == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "rk": pd.Series([], dtype=np.int64)})[cols]
        ids = df["doc_id"].to_numpy(np.int64)
        rk = ((ids % 1000003) * 2654435761) % 1000000007
        out = pd.DataFrame({"source": df["source"].astype(str),
                            "doc_id": ids, "rk": rk})
        out = out.sort_values(["rk", "doc_id"], kind="mergesort")
        pos = out.groupby("source", sort=False).cumcount()
        return out[pos.to_numpy() < max_quota][cols]

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rk", "doc_id"], kind="mergesort")
        quota = int(_quota(g["source"].iloc[:1]).item())
        g = g.head(quota).copy()
        g["pos"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "doc_id", "rk", "pos"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(finalize, batch_format="pandas")
    )


# --- RAKE keyphrase extraction -----------------------------------------------

def q_rake_phrases(sf_dir: str):
    """RAKE keyphrase extraction (Rose et al. 2010 — Rapid Automatic
    Keyword Extraction): per document, candidate phrases are the maximal
    runs of non-stopword tokens; each word scores deg(w)/freq(w) where
    freq counts the word's phrase occurrences in the doc and deg adds the
    lengths of the phrases it appears in; a phrase scores the sum of its
    words' scores, and the doc's keyphrase is the top scorer. Scores stay
    in exact integers: score_micro(w) = deg(w)·10⁶ // freq(w), summed —
    no float ever crosses the oracle boundary.

    Output: (doc_id, phrase, score_micro) — the best phrase per doc
    (ties by phrase asc); all-stopword docs emit nothing.

    Scale shape: embarrassingly parallel per doc — one batch explode
    (np.repeat + concatenate), stopword mask, phrase ids by boundary
    cumsum, then pandas C-kernel groupbys for freq/deg/phrase-sum. No
    shuffle, no state."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    stop = set(STOPWORDS)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "phrase", "score_micro"]
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "phrase": pd.Series([], dtype=object),
             "score_micro": pd.Series([], dtype=np.int64)})[cols]
        if len(df) == 0:
            return empty
        toks = df["text"].astype(str).str.split()
        lens = toks.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return empty
        words = np.concatenate([t for t in toks if len(t)])
        did = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        keep = ~pd.Series(words).isin(stop).to_numpy()
        # phrase id: a new phrase starts at a kept word whose predecessor
        # is dropped, a doc boundary, or position 0
        prev_keep = np.concatenate([[False], keep[:-1]])
        prev_did = np.concatenate([[-1], did[:-1]])
        start = keep & (~prev_keep | (prev_did != did))
        pid = np.cumsum(start) - 1
        w = pd.DataFrame(
            {"doc_id": did[keep], "word": words[keep], "pid": pid[keep]}
        )
        if len(w) == 0:
            return empty
        plen = w.groupby("pid")["word"].size().rename("plen")
        w = w.join(plen, on="pid")
        # per (doc, word): freq = occurrences, deg = sum of phrase lens
        ws = w.groupby(["doc_id", "word"], as_index=False).agg(
            freq=("word", "size"), deg=("plen", "sum")
        )
        ws["wscore"] = (
            ws["deg"].to_numpy(np.int64) * 1_000_000
        ) // ws["freq"].to_numpy(np.int64)
        w = w.merge(ws[["doc_id", "word", "wscore"]], on=["doc_id", "word"])
        ph = w.groupby("pid").agg(
            doc_id=("doc_id", "first"),
            phrase=("word", " ".join),
            score_micro=("wscore", "sum"),
        )
        # drop duplicate phrase strings within a doc (same phrase, same
        # score by construction), then keep the top scorer per doc
        ph = ph.drop_duplicates(["doc_id", "phrase"])
        ph = ph.sort_values(["score_micro", "phrase"],
                            ascending=[False, True], kind="mergesort")
        top = ph.groupby("doc_id", as_index=False).first()
        return pd.DataFrame(
            {
                "doc_id": top["doc_id"].to_numpy(np.int64),
                "phrase": top["phrase"].astype(str),
                "score_micro": top["score_micro"].to_numpy(np.int64),
            }
        )[cols]

    return ds.map_batches(fn, batch_format="pandas")


# --- cross-source vocabulary-distribution similarity -------------------------

def q_source_similarity(sf_dir: str):
    """Histogram-INTERSECTION similarity between every pair of sources'
    word-count distributions — the distribution-drift / source-overlap
    matrix on the VOCABULARY axis (``source_overlap`` counts verified
    near-dup pairs; this measures how similar two sources *read* even
    with zero duplicated documents): Σ_w min(c_a(w), c_b(w)), exact
    integer, the unnormalized histogram-intersection kernel.

    Output: (source_a, source_b, intersection) with source_a < source_b.

    Scale shape: one ``grouped_sums`` pass collapses the corpus to the
    (source, word) count table — bounded by vocabulary × source
    vocabulary, not corpus size — and the pairwise min-sum folds that
    bounded table driver-side. No pair of documents ever meets."""
    import ray.data as rd

    ds = read(sf_dir, "documents", ["source", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "word": pd.Series([], dtype=object)})
        toks = df["text"].astype(str).str.split()
        lens = toks.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "word": pd.Series([], dtype=object)})
        return pd.DataFrame(
            {
                "source": np.repeat(df["source"].to_numpy(object), lens),
                "word": np.concatenate([t for t in toks if len(t)]),
            }
        )

    h = grouped_sums(
        ds.map_batches(explode, batch_format="pandas"),
        ["source", "word"],
        sums={},
        count_as="c",
    ).to_pandas()  # <= |vocab| x |sources| rows

    # aggfunc='sum' keeps the path integer-exact (ADVICE r4: the default
    # 'mean' routes int64 through float64 — exact only below 2^53 and only
    # because post-grouped_sums (source, word) rows are unique; 'sum' makes
    # both the exactness and the uniqueness assumption explicit)
    piv = h.pivot_table(index="word", columns="source", values="c",
                        aggfunc="sum", fill_value=0)
    srcs = sorted(piv.columns)
    M = piv[srcs].to_numpy(np.int64)
    rows = []
    for i, sa in enumerate(srcs):
        for j in range(i + 1, len(srcs)):
            rows.append(
                (sa, srcs[j], int(np.minimum(M[:, i], M[:, j]).sum()))
            )
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "intersection"])
    out["intersection"] = out["intersection"].astype(np.int64)
    return rd.from_pandas(out)


# --- exact two-sample KS distance between source length distributions --------

def q_ks_lengths(sf_dir: str):
    """Exact two-sample KOLMOGOROV-SMIRNOV distance between every pair
    of sources' document-length distributions — the distribution-drift
    test on the LENGTH axis (``source_similarity`` compares vocabulary;
    this detects a source whose documents got longer/shorter, the
    classic crawl-change symptom). The statistic is kept EXACT in
    integers: KS = max_x |F_a(x) − F_b(x)| cross-multiplies to
    ks_num = max |cum_a(x)·n_b − cum_b(x)·n_a| over the union of
    observed lengths, with denominator n_a·n_b.

    Output: (source_a, source_b, ks_num, denom) with
    KS = ks_num / denom.

    Scale shape: one ``grouped_sums`` pass collapses the corpus to the
    (source, n_chars) count table — bounded by the length DOMAIN ×
    source vocabulary, not corpus size — and the pairwise CDF walk runs
    on that bounded table driver-side via vectorized cumsums."""
    import ray.data as rd

    ds = read(sf_dir, "documents", ["source", "n_chars"])

    h = grouped_sums(
        ds.map_batches(
            lambda df: pd.DataFrame(
                {"source": df["source"].astype(str),
                 "n_chars": df["n_chars"].to_numpy(np.int64)}),
            batch_format="pandas"),
        ["source", "n_chars"],
        sums={},
        count_as="c",
    ).to_pandas()  # <= |length domain| x |sources| rows

    # aggfunc='sum': integer-exact (same ADVICE r4 rationale as
    # q_source_similarity's pivot)
    piv = h.pivot_table(index="n_chars", columns="source", values="c",
                        aggfunc="sum", fill_value=0).sort_index()
    srcs = sorted(piv.columns)
    M = piv[srcs].to_numpy(np.int64)
    cum = np.cumsum(M, axis=0)          # CDF numerators per source
    n = cum[-1]                          # totals per source
    rows = []
    for i, sa in enumerate(srcs):
        for j in range(i + 1, len(srcs)):
            ks = int(np.abs(cum[:, i] * n[j] - cum[:, j] * n[i]).max())
            rows.append((sa, srcs[j], ks, int(n[i] * n[j])))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "ks_num",
                                      "denom"])
    out["ks_num"] = out["ks_num"].astype(np.int64)
    out["denom"] = out["denom"].astype(np.int64)
    return rd.from_pandas(out)
