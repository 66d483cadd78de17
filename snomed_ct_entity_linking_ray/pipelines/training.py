"""Training-data preparation operator family over the ``documents`` table.

Engine additions (build brief: "operations a large-scale training-data
pipeline would need") beyond the dedup/similarity families in dedup.py /
vectors.py:

- ``q_pack_sequences``  — concat-and-chunk sequence packing (the GPT-style
  pretraining layout): a DISTRIBUTED PREFIX SCAN assigns every document its
  global token offset and context-window span without any driver-side pass
  over the corpus.
- ``q_decontaminate``   — train/eval n-gram decontamination (the GPT-3
  appendix-C / Dolma pattern): eval-set n-grams are computed distributively,
  collected bounded, broadcast once, and matched per batch.
- ``q_tfidf_topk``      — per-document top-k salient terms by tf/df with a
  bit-exact cross-engine score (single IEEE division of two int64s).
- ``q_novel_docs``      — incremental-crawl content dedup: an anti-join of
  the new crawl against a reference corpus on content hash, bucketed by
  hash(fp) so neither side is ever driver-resident.

All outputs are exact types (int64 / string / one single-division double),
so the driver's value-hash compare vs DuckDB is deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..functions.hashing import md5_hex
from .common import broadcast, default_buckets, distinct_column, grouped_sums, read

# --------------------------------------------------------------------------
# sequence packing (distributed prefix scan)
# --------------------------------------------------------------------------

PACK_WINDOW = 256       # context-window size in tokens
PACK_PART_DOCS = 65_536  # docs per range partition of the scan


def q_pack_sequences(sf_dir: str, window: int = PACK_WINDOW):
    """Concat-and-chunk sequence packing: documents are laid out in doc_id
    order as one global token stream and cut into fixed ``window``-token
    training contexts; each doc gets its global ``token_start`` and the
    window span [first_window, last_window] it lands in.

    Scale shape — a textbook two-pass distributed prefix scan:
      1. slim count pass: map_batches → (doc_id, n_tokens, part) where
         part = doc_id // PACK_PART_DOCS (range partition on the dense
         int key; for sparse keys substitute a sort-based range
         partitioner). ``grouped_sums`` reduces it to ONE row per part.
      2. the driver turns the per-part sums (n_docs/PACK_PART_DOCS rows —
         bounded; grow PACK_PART_DOCS with corpus size to keep it so) into
         exclusive prefix offsets, broadcast once.
      3. second streaming pass: groupby(part) co-locates each range, a
         vectorized in-group cumsum + the part offset yields the global
         position. The shuffle moves only (doc_id, n_tokens, part) — the
         text never leaves the count stage.

    The text is read and tokenized ONCE (the slim counts table — 24 B/doc —
    is pinned and consumed by both the part-sum and the scan pass); nothing
    corpus-sized is materialized."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].str.count(" ") + 1).astype(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": n.to_numpy(),
                "part": ids // PACK_PART_DOCS,
            }
        )

    # Materialize the SLIM counts (24 B/doc ≈ 0.03% of corpus bytes): both
    # the per-part sum and the scan pass consume it, and without pinning it
    # each consumption would re-read + re-tokenize the full text. This is a
    # bounded intermediate, not a corpus materialization.
    slim = ds.map_batches(counts, batch_format="pandas").materialize()
    part_sums = (
        grouped_sums(slim, ["part"], sums={"part_tokens": "n_tokens"})
        .to_pandas()  # one row per part — driver-bounded by construction
        .sort_values("part")
    )
    totals = part_sums["part_tokens"].to_numpy(np.int64)
    offsets = dict(
        zip(
            part_sums["part"].to_numpy(np.int64).tolist(),
            (np.cumsum(totals) - totals).tolist(),
        )
    )
    ref = broadcast(offsets)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref)[int(g["part"].iloc[0])]
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy(np.int64)
        start = off + np.cumsum(n) - n
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "token_start": start,
                "first_window": start // window,
                "last_window": (start + n - 1) // window,
            }
        )

    return slim.groupby("part").map_groups(assign, batch_format="pandas")


# --------------------------------------------------------------------------
# train/eval decontamination
# --------------------------------------------------------------------------

# Eval split: every 97th doc_id is "benchmark" data. Real pipelines match
# 8-13-gram overlaps (GPT-3 appendix C uses 13); the fixture vocabulary is
# ~50 words, so 3-grams are the discriminative size at test scale. The
# operator shape is n-independent.
DECONTAM_N = 3
DECONTAM_EVAL_MOD = 97


def _ngrams(df: pd.DataFrame, n: int) -> pd.DataFrame:
    """Vectorized word n-grams of a batch: one flat word array + boundary
    mask; the join is n-1 object-array adds (C loop over PyObject concat —
    no Python-level per-row iteration)."""
    words = df["text"].str.split(" ")
    lens = words.str.len().to_numpy(np.int64)
    if len(df) == 0 or lens.sum() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "gram": pd.Series([], dtype=object)})
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
    doc = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
    # position within its doc; a gram starting at p is valid iff p+n <= len
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    valid = pos <= np.repeat(lens, lens) - n
    idx = np.flatnonzero(valid)
    gram = flat[idx]
    for j in range(1, n):
        gram = gram + " "
        gram = gram + flat[idx + j]
    return pd.DataFrame({"doc_id": doc[idx], "gram": gram})


# Two independent SipHash keys (pandas hash_key: 16 chars) for the Bloom
# double-hashing scheme h_i = h1 + i*h2 (Kirsch & Mitzenmacher 2006).
_BLOOM_KEY1 = "0123456789123456"
_BLOOM_KEY2 = "fedcba9876543210"
BLOOM_BITS_PER_KEY = 16
BLOOM_N_HASH = 8
# Above this many distinct eval grams the exact broadcast set gives way to
# the Bloom plan (same MAX_BROADCAST_KEYS rationale as semi_anti_filter).
DECONTAM_MAX_BROADCAST = 2_000_000


def _bloom_build(grams: pd.Series, m_bits: int) -> np.ndarray:
    """OR the grams into a packed uint64[m_bits/64] Bloom bit array."""
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(grams) == 0:
        return bits
    h1 = pd.util.hash_pandas_object(grams, index=False, hash_key=_BLOOM_KEY1).to_numpy()
    h2 = pd.util.hash_pandas_object(grams, index=False, hash_key=_BLOOM_KEY2).to_numpy()
    for i in range(BLOOM_N_HASH):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bits


def _bloom_probe(grams: pd.Series, bits: np.ndarray) -> np.ndarray:
    """Vectorized all-k-bits-set membership test (no false negatives)."""
    if len(grams) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = np.uint64(len(bits) * 64)
    h1 = pd.util.hash_pandas_object(grams, index=False, hash_key=_BLOOM_KEY1).to_numpy()
    h2 = pd.util.hash_pandas_object(grams, index=False, hash_key=_BLOOM_KEY2).to_numpy()
    hit = np.ones(len(grams), dtype=bool)
    for i in range(BLOOM_N_HASH):
        pos = (h1 + np.uint64(i) * h2) % m_bits
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


def q_decontaminate(
    sf_dir: str, n: int = DECONTAM_N, max_broadcast: int = DECONTAM_MAX_BROADCAST
):
    """Benchmark decontamination: count, per training doc, the n-gram
    positions whose gram also occurs anywhere in the eval split
    (doc_id % 97 == 0); emit only contaminated docs.

    Scale shape, two documented plans on the eval side (a ~1% split whose
    DISTINCT grams are always computed distributively — ``distinct_column``;
    the driver never holds more than the distinct result):

    - ``≤ max_broadcast`` distinct grams: broadcast the exact frozenset
      once, probe per batch with a vectorized isin. EXACT — the plan the
      driver's oracle gate runs.
    - above it: fold the distinct grams into a BLOOM FILTER
      (BLOOM_BITS_PER_KEY bits/gram, BLOOM_N_HASH double-hashed probes —
      ~0.06% false-positive rate) built by a distributed bitwise-OR
      tree-reduce of per-batch partial bit arrays, broadcast the packed
      bits (~2 MB per million grams vs ~60 MB of strings), probe per batch
      with the vectorized all-bits-set test. NO false negatives (every
      true contamination is reported — the guarantee that matters for
      decontamination); false positives only ever ADD a spurious
      contaminated row (tests/test_training.py pins both properties)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def eval_grams(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % DECONTAM_EVAL_MOD == 0]
        return _ngrams(df, n)[["gram"]].drop_duplicates()

    distinct = distinct_column(
        ds.map_batches(eval_grams, batch_format="pandas"), "gram"
    ).materialize()
    n_grams = distinct.count()

    if n_grams <= max_broadcast:
        ev = distinct.to_pandas()
        # a fully-empty Dataset collects to a column-less frame
        grams = ev["gram"].tolist() if "gram" in ev.columns else []
        payload, exact = frozenset(grams), True
    else:
        m_bits = 1 << int(np.ceil(np.log2(max(n_grams * BLOOM_BITS_PER_KEY, 64))))

        def partial_bloom(df: pd.DataFrame) -> pd.DataFrame:
            bits = _bloom_build(df["gram"], m_bits)
            return pd.DataFrame({"bits": [bits.tobytes()]})

        def or_combine(df: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(m_bits // 64, dtype=np.uint64)
            for blob in df["bits"]:
                acc |= np.frombuffer(blob, dtype=np.uint64)
            return pd.DataFrame({"bits": [acc.tobytes()]})

        from .common import tree_to_pandas

        folded = tree_to_pandas(
            distinct.map_batches(partial_bloom, batch_format="pandas"), or_combine
        )
        acc = np.zeros(m_bits // 64, dtype=np.uint64)
        for blob in folded["bits"]:
            acc |= np.frombuffer(blob, dtype=np.uint64)
        payload, exact = acc, False
    ref = broadcast((payload, exact))

    class Probe:
        def __init__(self):
            self.payload, self.exact = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"] % DECONTAM_EVAL_MOD != 0]
            g = _ngrams(df, n)
            if self.exact:
                mask = g["gram"].isin(self.payload).to_numpy()
            else:
                mask = _bloom_probe(g["gram"], self.payload)
            hits = g[mask]
            vc = hits.groupby("doc_id", sort=False).size()
            return pd.DataFrame(
                {
                    "doc_id": vc.index.to_numpy(np.int64),
                    "n_contaminated": vc.to_numpy(np.int64),
                }
            )

    return ds.map_batches(Probe, batch_format="pandas", concurrency=(1, 4))


# --------------------------------------------------------------------------
# tf/df salient terms
# --------------------------------------------------------------------------


def q_tfidf_topk(sf_dir: str, k: int = 3):
    """Per-document top-k salient terms ranked by tf/df (idf ∝ 1/df with N
    constant, so the ranking equals tf·idf ranking without a transcendental
    in the contract). ``score = CAST(tf AS DOUBLE)/df`` is ONE IEEE-754
    division of two exact int64s — correctly rounded and therefore
    bit-identical in numpy and DuckDB, so the driver hash-compares the
    double directly. Ties break on the word.

    Scale shape: df comes from the ``q_doc_freq`` combine (one slim
    shuffle, vocabulary-bounded output), is collected bounded and broadcast
    once; the scoring pass is embarrassingly parallel — each doc is one row,
    so tf and the per-doc top-k complete inside the batch."""
    from .text import q_doc_freq

    dfm = q_doc_freq(sf_dir).to_pandas()  # vocabulary-bounded
    ref = broadcast(dict(zip(dfm["word"], dfm["df"].to_numpy(np.int64).tolist())))

    class Score:
        def __init__(self):
            self.df = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            ex = df["text"].str.split(" ").explode()
            tf = (
                ex.groupby([ex.index, ex]).size().rename("tf").reset_index()
            )
            tf.columns = ["row", "word", "tf"]
            dfv = tf["word"].map(self.df).to_numpy(np.int64)
            tfv = tf["tf"].to_numpy(np.int64)
            out = pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64)[tf["row"]],
                    "word": tf["word"],
                    "tf": tfv,
                    "df": dfv,
                    "score": tfv.astype(np.float64) / dfv,
                }
            )
            out = out.sort_values(
                ["doc_id", "score", "word"], ascending=[True, False, True]
            )
            out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
            return out[out["rank"] <= k].reset_index(drop=True)

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Score, batch_format="pandas", concurrency=(1, 4)
    )


# --------------------------------------------------------------------------
# deterministic fixed-size global sample
# --------------------------------------------------------------------------


def q_sample_topk_hash(sf_dir: str, k: int = 100):
    """Deterministic uniform k-sample of the corpus: the k docs with the
    smallest value of the same integer mixer ``q_sample_stratified`` uses
    (RNG-free, resumable — re-running any partition reproduces the same
    sample; the eval-subset selection a training pipeline pins down).

    Scale shape: per-block partial top-k (sort+head inside map_batches),
    driver-side final head over ≤ k rows per block — the ``cosine_topk``
    discipline; no shuffle, no reservoir state."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        df = df.assign(rk=((ids % 1000003) * 2654435761) % 1000000007)
        return df.sort_values(["rk", "doc_id"]).head(k)

    return (
        read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["rk", "doc_id"])
        .head(k)
        .reset_index(drop=True)[["doc_id", "lang", "n_chars", "rk"]]
        .astype({"rk": np.int64})
    )


# --------------------------------------------------------------------------
# tokenizer-vocabulary construction
# --------------------------------------------------------------------------


def q_vocab_topk(sf_dir: str, k: int = 1000):
    """Tokenizer vocabulary: the k most frequent corpus words, assigned
    contiguous token ids by (count desc, word asc) — the id table a
    word-level tokenizer trains from.

    Scale shape: corpus counts come from the ``q_unigrams`` combine
    (partials per batch, one slim bucketed shuffle, output bounded by
    vocabulary size); each count block then emits its OWN top-k partial
    (sort+head inside map_batches — the ``cosine_topk`` discipline), so
    the final driver-side head(k) sees at most k rows per block, never the
    vocabulary."""
    from .text import q_unigrams

    counts = q_unigrams(sf_dir)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "word"], ascending=[False, True]).head(k)

    top = (
        counts.map_batches(partial_topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per count block
        .sort_values(["n", "word"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["token_id"] = np.arange(len(top), dtype=np.int64)
    return top[["token_id", "word", "n"]]


# --------------------------------------------------------------------------
# heavy hitters (Misra-Gries sketch + exact verify)
# --------------------------------------------------------------------------

HH_K = 30  # report words with count > n_tokens/HH_K (k < fixture vocab of 31,
          # so the MG merge actually compresses; 16 hitters at sf0.01)


def q_heavy_hitters(sf_dir: str, k: int = HH_K):
    """Corpus heavy hitters: every word with count > n_tokens/k, with its
    EXACT count — the two-pass Misra-Gries plan (Misra & Gries 1982;
    mergeable-summaries merge rule, Agarwal et al. 2012):

      1. candidate pass: per-batch exact counts (bounded by batch
         vocabulary) tree-merged with MG compression — add counters,
         subtract the k-th largest, drop ≤0 — so every intermediate holds
         < k counters yet provably contains every item with true frequency
         > n/k. The driver sees < k candidate words, NEVER the vocabulary:
         this is the top-words plan for a corpus whose vocabulary itself
         is too big to shuffle (where ``q_vocab_topk`` stops scaling).
      2. verify pass: exact counts for the < k broadcast candidates plus
         the exact total, one tiny combine; filter count·k > total.

    The sketch is deterministic (exact integer sums, fixed threshold), so
    the result is exact and matches plain SQL."""
    from .common import tree_to_pandas

    ds = read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        vc = words.value_counts()
        return pd.DataFrame(
            {"word": vc.index, "c": vc.to_numpy().astype(np.int64)}
        )

    def mg_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False)["c"].sum()
        if len(g) >= k:
            thr = np.partition(g.to_numpy(), len(g) - k)[len(g) - k]
            g = g - thr
            g = g[g > 0]
        return pd.DataFrame({"word": g.index, "c": g.to_numpy().astype(np.int64)})

    cand = tree_to_pandas(
        ds.map_batches(partial, batch_format="pandas"), mg_merge
    )
    cand = mg_merge(cand)  # final compression: < k candidates
    ref = broadcast(frozenset(cand["word"].tolist()))

    class Recount:
        def __init__(self):
            self.cand = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            words = df["text"].str.split(" ").explode()
            vc = words[words.isin(self.cand)].value_counts()
            out = pd.DataFrame(
                {"word": vc.index, "n": vc.to_numpy().astype(np.int64)}
            )
            out.loc[len(out)] = ["\x00total", np.int64(len(words))]
            return out

    counts = tree_to_pandas(
        ds.map_batches(Recount, batch_format="pandas", concurrency=(1, 4)),
        lambda df: df.groupby("word", as_index=False, sort=False)["n"].sum(),
    )
    counts = counts.groupby("word", as_index=False, sort=False)["n"].sum()
    total = int(counts.loc[counts["word"] == "\x00total", "n"].iloc[0])
    out = counts[counts["word"] != "\x00total"]
    out = out[out["n"] * k > total].reset_index(drop=True)
    return out.sort_values("word").reset_index(drop=True)[["word", "n"]]


# --------------------------------------------------------------------------
# Gopher-style repetition stats
# --------------------------------------------------------------------------


def q_repetition_stats(sf_dir: str):
    """Within-document repetition signals (the Gopher/MassiveText quality
    rules: duplicate-n-gram and top-n-gram fractions — Rae et al. 2021
    §A1.1): exact integer numerators/denominators per doc, so the
    downstream filter computes its own thresholds and the driver compare
    has no float in it.

    Embarrassingly parallel: each doc is one row; one vectorized explode +
    two grouped counts per batch. No shuffle."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        words = df["text"].str.split(" ")
        n_words = words.str.len().to_numpy(np.int64)
        ex = words.explode()
        n_dw = (
            ex.groupby([ex.index, ex]).size().groupby(level=0).size()
            .reindex(df.index, fill_value=0).to_numpy(np.int64)
        )
        bg = _ngrams(df, 2)
        bgc = bg.groupby(["doc_id", "gram"], sort=False).size()
        per_doc = bgc.groupby(level=0)
        n_db = per_doc.size()
        top = per_doc.max()
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_words": n_words,
                "n_distinct_words": n_dw,
                "n_bigrams": n_words - 1,
                "n_distinct_bigrams": n_db.reindex(ids, fill_value=0).to_numpy(np.int64),
                "top_bigram_count": top.reindex(ids, fill_value=0).to_numpy(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


# --------------------------------------------------------------------------
# quality-classifier scoring (real-weights actor pool)
# --------------------------------------------------------------------------


def q_quality_score(sf_dir: str):
    """fastText-style quality filter: a linear classifier over hashed
    word-bigram features scores every document; ``keep = score_q >= 0``.

    The A2/A3 real-weights shape: the quantized weights live in an on-disk
    artifact; every scoring actor loads them ONCE in ``__init__`` (swap the
    numpy scatter for a GPU forward and ``num_cpus`` for ``num_gpus`` on a
    real cluster — the plumbing is identical). Scores are exact int64
    (integer-quantized weights), so the driver hash-compares them against
    the independent single-process oracle with no float-order caveat.

    Embarrassingly parallel: no shuffle; per batch one vectorized bigram
    explode + one hashed scatter-add."""
    from ..functions.quality import QualityModel, ensure_quality_artifact, feature_ids

    ensure_quality_artifact()

    class Scorer:
        def __init__(self):
            self.model = QualityModel()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            ids = df["doc_id"].to_numpy(np.int64)
            g = _ngrams(df, 2)
            order = np.argsort(ids)
            row = order[np.searchsorted(ids[order], g["doc_id"].to_numpy(np.int64))]
            feat = (
                feature_ids(g["gram"].to_numpy())
                if len(g)
                else np.array([], dtype=np.int64)
            )
            s = self.model.score(row, feat, len(df))
            return pd.DataFrame(
                {
                    "doc_id": ids,
                    "score_q": s,
                    "keep": (s >= 0).astype(np.int64),
                }
            )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Scorer, batch_format="pandas", concurrency=(1, 4)
    )


# --------------------------------------------------------------------------
# incremental-crawl content anti-join
# --------------------------------------------------------------------------


def q_novel_docs(sf_dir: str):
    """New-crawl dedup against a reference corpus: docs outside source
    'src0' whose content hash (md5 of lowercased text) never occurs in the
    'src0' reference corpus.

    Scale shape: BOTH sides reduce to slim (fp, is_ref, doc_id) rows inside
    map_batches, then one hash(fp)-bucketed shuffle co-locates every copy
    of a hash; the anti-join is a vectorized isin inside each bucket task.
    Neither corpus is driver-resident or broadcast — this is the
    over-threshold branch of ``semi_anti_filter`` specialized to a
    content-hash key it derives itself."""
    ds = read(sf_dir, "documents", ["doc_id", "text", "source"])
    n_buckets = default_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        fp = np.array([md5_hex(t.lower()) for t in df["text"]], dtype=object)
        h = pd.util.hash_pandas_object(pd.Series(fp), index=False).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "fp": fp,
                "is_ref": (df["source"] == "src0").to_numpy(),
                "_fb": (h % np.uint64(n_buckets)).astype(np.int64),
            }
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        ref_fps = g.loc[g["is_ref"], "fp"]
        keep = ~g["is_ref"] & ~g["fp"].isin(set(ref_fps))
        return pd.DataFrame({"doc_id": g.loc[keep, "doc_id"].to_numpy(np.int64)})

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_fb")
        .map_groups(anti, batch_format="pandas")
    )


SUBSTR_FRAG_TOKENS = 3


def q_substring_contamination(sf_dir: str, frag_tokens: int = SUBSTR_FRAG_TOKENS):
    """Exact-substring decontamination (the complement of the n-gram-set
    plan in q_decontaminate: eval PASSAGES are searched verbatim inside
    every training doc — the GPT-3/C4 appendix discipline for detecting
    copied eval strings rather than overlapping vocabularies). Eval
    fragment = the first ``frag_tokens`` tokens of each eval doc
    (doc_id % DECONTAM_EVAL_MOD == 0); output counts, per training doc,
    how many DISTINCT fragments occur as substrings.

    Scale shape: distinct fragments are computed distributively
    (``distinct_column`` — the eval split is ~1%, fragments are short and
    dictionary-bounded), compiled ONCE into the shared Aho-Corasick
    automaton (state/automaton.py — the M18 static-dict scanner), and
    broadcast to an actor pool; each actor scans its batches in one
    automaton pass per doc (all fragments simultaneously, independent of
    fragment count), so no per-fragment re-scan and no eval-side
    re-shipping per batch."""
    from ..state.automaton import AhoCorasick

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def frags(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % DECONTAM_EVAL_MOD == 0]
        f = (
            df["text"].astype(str).str.split(" ").str[:frag_tokens].str.join(" ")
        )
        f = f[f != ""]
        return pd.DataFrame({"frag": f.to_numpy(object)}).drop_duplicates()

    distinct = distinct_column(
        ds.map_batches(frags, batch_format="pandas"), "frag"
    ).to_pandas()
    frag_list = sorted(distinct["frag"].tolist()) if "frag" in distinct.columns else []
    frag_ref = broadcast(frag_list)

    class Scan:
        def __init__(self):
            pats = ray.get(frag_ref)
            self.ac = AhoCorasick({p: i for i, p in enumerate(pats)}) if pats else None
            self.n_pats = len(pats)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out_ids: list = []
            out_n: list = []
            if self.ac is not None:
                train = df[df["doc_id"] % DECONTAM_EVAL_MOD != 0]
                for doc_id, text in zip(train["doc_id"], train["text"]):
                    hits = {pid for _, _, pid in self.ac.find_all(text)}
                    if hits:
                        out_ids.append(int(doc_id))
                        out_n.append(len(hits))
            import pyarrow as pa

            # Arrow output with pinned schema: an all-empty pandas result
            # collects to a column-less frame (the distinct_column note)
            return pa.Table.from_arrays(
                [
                    pa.array(np.array(out_ids, dtype=np.int64), pa.int64()),
                    pa.array(np.array(out_n, dtype=np.int64), pa.int64()),
                ],
                schema=pa.schema([("doc_id", pa.int64()), ("n_frags", pa.int64())]),
            )

    return ds.map_batches(Scan, batch_format="pandas", concurrency=(1, 8))


def q_decontaminate_bloom(sf_dir: str, n: int = DECONTAM_N):
    """The Bloom-filter decontamination plan under the correctness gate:
    ``q_decontaminate`` with ``max_broadcast=0`` so the distributed
    OR-tree Bloom build + packed-bits broadcast + vectorized probe is the
    path that runs at EVERY scale (at real corpus sizes it activates on
    its own above 2M distinct eval grams). The oracle is an independent
    single-process implementation of the same Bloom spec (16 bits/key,
    8 Kirsch-Mitzenmacher double-hashed probes over pandas SipHash keys)
    — false positives are a deterministic function of the spec, so the
    compare is exact, and the no-false-negative property is additionally
    pinned by tests/test_training.py."""
    return q_decontaminate(sf_dir, n=n, max_broadcast=0)


# --------------------------------------------------------------------------
# weighted sampling without replacement (integer replicated-key scheme)
# --------------------------------------------------------------------------


def q_weighted_sample(sf_dir: str, k: int = 100, max_w: int = 13):
    """Deterministic weighted sample without replacement: the k docs with
    the largest replicated-hash key, where each doc holds w = 1 + (n_chars
    mod ``max_w``) lottery tickets — the data-mixing primitive (sample
    sources proportionally to a per-doc weight) in the RNG-free, resumable
    form every sampler in this repo uses.

    Scheme: the exact-integer variant of Efraimidis-Sampling — doc key =
    MAX over j<w of mixer(doc_id*16 + j) (w <= 13 < 16, so ticket ids never
    collide across docs). Pairwise, P(max of w iid keys beats max of v) =
    w/(w+v), so inclusion is weight-proportional, yet every comparison is
    int64 (no pow/log ULP hazard between engines — the reason NOT to use
    the float u^(1/w) form here).

    Scale shape: tickets are materialized per BATCH only (np.repeat +
    one reduceat; <= 13x batch rows transient), each batch emits its own
    top-k partial (the `cosine_topk` discipline), and the driver's final
    head sees <= k rows per block. No shuffle, no reservoir state, trivially
    resumable."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        w = 1 + (df["n_chars"].to_numpy(np.int64) % max_w)
        rep = np.repeat(ids, w) * 16
        starts = np.cumsum(w) - w
        j = np.arange(int(w.sum()), dtype=np.int64) - np.repeat(starts, w)
        mixed = (((rep + j) % 1000003) * 2654435761) % 1000000007
        rk = np.maximum.reduceat(mixed, starts)
        out = pd.DataFrame({"doc_id": ids, "w": w.astype(np.int64), "rk": rk})
        return out.sort_values(["rk", "doc_id"], ascending=[False, True]).head(k)

    return (
        read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["rk", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["doc_id", "w", "rk"]]
    )


# --------------------------------------------------------------------------
# BPE merge training (tokenizer construction, Sennrich 2016)
# --------------------------------------------------------------------------


def q_bpe_merges(sf_dir: str, n_merges: int = 12):
    """The first ``n_merges`` byte-pair-encoding merge rules learned from
    the corpus — tokenizer TRAINING, the step upstream of every token-count
    operator here. Output: (rank, left, right, pair_count) per merge,
    deterministic tie-break (count desc, then left asc, right asc).

    Scale shape — the part that matters at 100 TB: BPE never needs the
    corpus, only the WORD-FREQUENCY table (Sennrich 2016 §3.2 operates on
    a word-count dict). Step 1 is the distributed `q_unigrams` combine
    (per-batch partials, one slim bucketed shuffle, output bounded by
    vocabulary, Heaps-law sublinear in corpus size). Step 2 — the merge
    loop — runs over that bounded table once, driver-side under the
    `tree_to_pandas` collect bound, recounting only words that CONTAIN the
    just-merged pair (the standard incremental optimization; full recount
    only on pass 0).

    Symbol alphabet: words are the space-split tokens of the raw text
    (the `q_unigrams` tokenizer), split to single characters; no
    end-of-word sentinel (merges never cross word boundaries by
    construction)."""
    from collections import Counter

    from .text import q_unigrams

    vocab = q_unigrams(sf_dir).to_pandas()  # bounded: one row per word
    words = [tuple(w) for w in vocab["word"].astype(str)]
    counts = vocab["n"].to_numpy(np.int64)

    def pair_counts(idx):
        pc_ = Counter()
        for i in idx:
            syms, c = words[i], int(counts[i])
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += c
        return pc_

    live = [i for i, s in enumerate(words) if len(s) > 1]
    pc_ = pair_counts(live)
    merges = []
    for rank in range(n_merges):
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), cnt = best
        merges.append((rank, la, rb, int(cnt)))
        tok = la + rb
        for i in live:
            syms = words[i]
            if len(syms) < 2:
                continue
            # fast reject before the rewrite walk
            if la not in syms:
                continue
            out, j, changed = [], 0, False
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == la and syms[j + 1] == rb:
                    out.append(tok)
                    j += 2
                    changed = True
                else:
                    out.append(syms[j])
                    j += 1
            if changed:
                c = int(counts[i])
                for a, b in zip(syms, syms[1:]):
                    pc_[(a, b)] -= c
                    if pc_[(a, b)] <= 0:
                        del pc_[(a, b)]
                new = tuple(out)
                words[i] = new
                for a, b in zip(new, new[1:]):
                    pc_[(a, b)] += c
        if cnt != merges[-1][3]:  # pragma: no cover - defensive
            raise AssertionError
    out = pd.DataFrame(
        merges, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": np.int64, "pair_count": np.int64})
    import ray.data as rd

    return rd.from_pandas(out)


# --------------------------------------------------------------------------
# BPE tokenizer application (the encode step paired with q_bpe_merges)
# --------------------------------------------------------------------------


def bpe_encode_len(word: str, rank_of: dict) -> int:
    """Token count of one word under a learned merge table: the textbook
    BPE apply loop — repeatedly merge the pair with the LOWEST rank,
    left-to-right within a pass, until no learned pair remains.  Shared
    by the engine actors and the single-process oracle so the contract
    under test is the distributed orchestration, not the walk."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            r = rank_of.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                la, rb = a, b
        if best_rank is None:
            break
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == la and syms[j + 1] == rb:
                out.append(la + rb)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return len(syms)


def q_bpe_tokens(sf_dir: str, n_merges: int = 12):
    """Per-doc token counts under the corpus-trained BPE merge table —
    tokenizer APPLICATION, the encode pass every training-data pipeline
    runs after q_bpe_merges trains the rules (Sennrich 2016 §3.2's
    apply step).  Output: (doc_id, n_words, n_tokens).

    Scale shape: the merge table is rank-bounded (n_merges rows) and
    broadcasts once; encoding is an actor-pool stage whose per-actor
    word→length CACHE exploits the Zipfian corpus (each actor pays the
    merge walk once per DISTINCT word it sees — the A6 tokenizer-pool
    discipline); per doc the count is one vectorized unique+map over its
    words.  No shuffle at all — the op is embarrassingly parallel after
    the (bounded) training collect."""
    merges = q_bpe_merges(sf_dir, n_merges=n_merges).to_pandas()
    rank_of = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    ref = broadcast(rank_of)

    class Encode:
        def __init__(self):
            self.rank_of = ray.get(ref)
            self.cache: dict = {}

        def _len(self, w: str) -> int:
            n = self.cache.get(w)
            if n is None:
                n = bpe_encode_len(w, self.rank_of)
                self.cache[w] = n
            return n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n_words = np.zeros(len(df), np.int64)
            n_tokens = np.zeros(len(df), np.int64)
            for i, text in enumerate(df["text"]):
                words = str(text).split(" ")
                n_words[i] = len(words)
                uw, cnt = np.unique(np.asarray(words, object),
                                    return_counts=True)
                lens = np.fromiter(
                    (self._len(w) for w in uw), np.int64, len(uw)
                )
                n_tokens[i] = int((lens * cnt).sum())
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "n_words": n_words,
                    "n_tokens": n_tokens,
                }
            )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Encode, batch_format="pandas", concurrency=(1, 8)
    )
