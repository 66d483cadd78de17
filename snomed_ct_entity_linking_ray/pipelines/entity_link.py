"""Flagship pipeline: blocking + pairwise scoring + transitive clustering
(BASELINE.json north_rule; SURVEY.md §7.1 architecture).

Re-expresses the reference winners' shared skeleton — generate mentions →
attach candidate concepts → score → resolve — as record linkage over Arrow:

    docs ──mb──▶ flatten + sectionize (M2/M3, §2.2)
         ──mb-actor──▶ mention extraction: Aho-Corasick over normalized text
                       with raw-offset remapping + trailing-plural tolerance
                       (M1/M4/M18 semantics, 1st Place/src/mimic_common.py:
                       50-71,127-161; 2nd Place/submission/static_dict.py:36-53)
    mentions ──mb──▶ candidate pairs, SHUFFLE-FREE (default plan): the
                       concept side of each char-3gram block is
                       dictionary-bounded, so it broadcasts as a CSR
                       (``concept_block_state``) and every mention batch
                       emits its own mention×concept pairs locally —
                       no groupby exchange anywhere in the flagship.
                       Blocks over BLOCK_CAP are capped by a driver-
                       computed node-hash threshold (logged, not silent).
                       Fallback plan for dictionaries too large to
                       broadcast (> BROADCAST_PAIRGEN_MAX_ROWS): the
                       original salted groupby(block_key) exchange with
                       HOT KEYS SALTED from the measured G1 frequency
                       table (the reference's "pain" blacklists,
                       1st Place/src/mimic_train.py:30,36-42)
    pairs ──mb-actor──▶ hybrid scoring: Jaro-Winkler (DuckDB C++ kernel)
                       + char-3gram hash-embedding cosine (A3 stand-in)
         ──filter(score ≥ θ) + per-batch distinct──▶ θ-passing
                       (surface, concept) links, tree-combined so the
                       driver sees a dictionary-bounded table
    links ──star contraction──▶ concept↔concept cliques per CORPUS-OBSERVED
          surface → union-find over the contracted graph (driver-side numpy
          when the contracted edge list is dictionary-bounded; the
          distributed stages/components.py path beyond that) — EXACT,
          because a mention's edge set is a pure function of its surface,
          so degree-1 mention nodes contract away losslessly
         ──▶ per-cluster majority concept vote (G2/G6, weighted by the
              surface frequency table; 2nd Place/src/static_dict.py:116-122)
         ──▶ broadcast sid→concept attach + per-doc overlap resolution
              (D2, mimic_common.py:170-209; vectorized contained-span fast
              path, exact sweep for staggered docs)
    ──▶ linked mentions (doc_id, start, end, concept_id)

Scale notes:
- The EXACT dictionary path never enters the shuffle: surface → dictionary
  concepts is a broadcast artifact, so exact links join the candidate sets
  directly and mentions attach via the broadcast sid→concept array.
- Mention rows carry ``sid`` (int32 index into the broadcast surface list)
  instead of surface strings; the block-key shuffle payload is all-int.
- Three streaming executions end-to-end: extract(materialize, with the
  G1 frequency table accumulated by a FreqSink side-channel actor during
  the same pass) → pairgen/score/distinct tree (ONE execution, zero
  exchanges under the broadcast plan) → attach+resolve (consumed).
  The flagship path also drops the section string column from the
  materialized mentions (nothing downstream needs it), cutting the
  object-store round-trip of the biggest intermediate.
- Per-doc overlap resolution relies on doc-contiguity within blocks; the
  extractor emits a per-doc row count (``doc_n``) and resolution VERIFIES
  the invariant per batch, failing loudly instead of emitting overlaps.
  ``resolution="grouped"`` is the shuffle-based fallback for layouts that
  can't guarantee contiguity (blocks split at target_max_block_size).

Input docs are the interleaved-span fixture tables (input_hint shape); the
spans column is projected away immediately after flattening and never
mutated — span-sequence equality vs input is checked in tests.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .. import fixtures
from ..functions.docs import flatten_batch
from ..functions.overlaps import remove_overlaps
from ..functions.sections import SectionIndex, find_sections
from ..functions.similarity import DuckSimilarity, hash_embed
from ..functions.text import normalize_text
from ..functions.hashing import stable_u64
from ..state.automaton import AhoCorasick
from .common import tree_to_pandas

logger = logging.getLogger(__name__)

THETA = 0.995         # pair-score threshold (T6-class gate): dictionary-exact
                      # matches score exactly 1.0; 1-edit near-misses top out
                      # ≈0.99·½ + 0.97·½ < 0.995 (measured in tests)
BLOCK_CAP = 20_000    # max pairs generated per block before salting kicks in
HOT_KEY_MENTIONS = 2_000   # mention count above which a block key is salted
N_SALT = 8
DRIVER_CC_MAX_EDGES = 2_000_000  # contracted-graph size above which the
                                 # distributed union-find takes over

MENTION_NODE_FLAG = np.int64(1) << np.int64(62)


def mention_node_array(df: pd.DataFrame) -> np.ndarray:
    """Vectorized stable mention-node ids from (doc_id, start, end). The
    ids are runtime-internal (pandas' deterministic-within-a-version string
    hash): every consumer in one run derives them through this same
    function, and no node id reaches persisted output — the final table
    carries concept ids only."""
    h = pd.util.hash_pandas_object(df["doc_id"], index=False).to_numpy()
    s = df["start"].to_numpy().astype(np.uint64)
    e = df["end"].to_numpy().astype(np.uint64)
    mix = h ^ (s * np.uint64(0x9E3779B97F4A7C15)) ^ (e * np.uint64(0xC2B2AE3D27D4EB4F))
    return (MENTION_NODE_FLAG | (mix >> np.uint64(3)).astype(np.int64)).astype(np.int64)


# --------------------------------------------------------------------------
# dictionary / state build: runs in ONE Ray task per fixture key and is
# cached per driver process together with its broadcast refs (VERDICT r3
# #5 — the driver never loops over the concept table, and repeated query
# calls against the same fixture reuse the same broadcast objects).
# --------------------------------------------------------------------------

def build_link_state(fixture_path: str):
    import pyarrow.parquet as pq

    concepts = pq.read_table(
        f"{fixture_path}/concepts.parquet", columns=["concept_id", "name", "kind"]
    )
    surface_to_cids: dict[str, list[int]] = {}
    for name, cid in zip(concepts["name"].to_pylist(), concepts["concept_id"].to_pylist()):
        norm = normalize_text(name)
        if not norm:
            continue
        surface_to_cids.setdefault(norm, [])
        if cid not in surface_to_cids[norm]:
            surface_to_cids[norm].append(cid)
    surfaces = sorted(surface_to_cids)
    emb = hash_embed(surfaces)
    # unsalted fuzzy block id per sid (int64; low 4 bits reserved for salt)
    block_of_sid = np.array(
        [prefix_block_id(s[:3]) for s in surfaces], dtype=np.int64
    )
    from ..functions.vecmatch import VecDict

    # NOTE: the Aho-Corasick automaton is NOT built here — extractor actors
    # build it lazily only when they actually hit non-ASCII docs (shipping
    # the ~10s-of-MB python trie to every actor measurably serialized actor
    # startup; the VecDict is a few numpy arrays and ships zero-copy-ish).
    return {
        "vecdict": VecDict(surfaces),
        "surfaces": surfaces,
        "surface_to_cids": {s: sorted(v) for s, v in surface_to_cids.items()},
        "surface_emb": emb,
        "block_of_sid": block_of_sid,
    }


_build_link_state_task = ray.remote(num_cpus=1)(build_link_state)
_LINK_STATE_CACHE: dict[str, dict] = {}


def link_state_cached(fixture_path: str) -> dict:
    """Dictionary state per fixture key: built ONCE in a Ray task (the
    concept-table loop runs off the driver's critical path and exactly
    once per process), then cached with its broadcast refs (``vd_ref``,
    ``block_ref``, ``score_ref`` ship once per process, not once per query
    call). Callers receive a SHALLOW COPY so per-call keys (``freq_sinks``)
    never leak across calls; the shared entries are all immutable pure
    functions of the fixture."""
    cached = _LINK_STATE_CACHE.get(fixture_path)
    if cached is None:
        import copy as _copy

        # ray.get returns plasma-backed READ-ONLY views; deep-copy into
        # owned driver memory before caching (one-time cost, dictionary-
        # bounded arrays). score/block refs are NOT pre-put here: they are
        # created lazily at scoring time (score_pairs /
        # candidate_pairs_auto) so nothing beyond the extraction dictionary
        # is pinned in the object store through the extraction flood —
        # pre-putting them at build time correlated with 2-3.5x slower,
        # high-variance block+score in the 1M-doc ABAB campaign
        # (BASELINE.md round 4).
        cached = _copy.deepcopy(ray.get(_build_link_state_task.remote(fixture_path)))
        cached["vd_ref"] = ray.put(cached["vecdict"])
        _LINK_STATE_CACHE[fixture_path] = cached
    return dict(cached)


# --------------------------------------------------------------------------
# mention extraction (stateful actor pool — A1 analogue)
# --------------------------------------------------------------------------

def _norm_with_map(raw: str):
    """Length-tracked normalization: returns (norm_text, norm2raw) where
    norm2raw[i] is the raw offset of norm char i (spaces map to the gap
    position). Tokens are [a-z0-9]+ runs of the lowered raw text, joined by
    single spaces — same token stream as normalize_text (M17) but with an
    exact offset map back into the raw string."""
    import re

    low = raw.lower()
    parts: list[str] = []
    idx_parts: list[np.ndarray] = []
    for m in re.finditer(r"[a-z0-9]+", low):
        parts.append(m.group(0))
        idx_parts.append(np.arange(m.start(), m.end(), dtype=np.int64))
    if not parts:
        return "", np.zeros(0, dtype=np.int64)
    norm = " ".join(parts)
    out = []
    for i, arr in enumerate(idx_parts):
        out.append(arr)
        if i + 1 < len(idx_parts):
            out.append(np.array([arr[-1] + 1], dtype=np.int64))  # the join space
    norm2raw = np.concatenate(out)
    assert len(norm2raw) == len(norm)
    return norm, norm2raw


@ray.remote(num_cpus=0)
class FreqSink:
    """Side-channel accumulator for the G1 surface-frequency table: each
    extraction task pushes its per-batch sparse (sid, count) partial, so
    the frequency table is ready the moment the mentions materialize —
    no second read pass over the biggest intermediate and no separate
    streaming execution (VERDICT r2 #1a).

    Pushes are FIRE-AND-FORGET (VERDICT r3 #2: the old per-batch
    ``ray.get`` ACK serialized every extraction batch through one actor
    round-trip — a global serialization point on the dominant stage at
    cluster scale). Completeness is instead verified at READ time by
    ``freq_totals``: sum(freq) must equal the materialized mention count
    (each mention row contributes exactly 1 to exactly one sid), with the
    ``surface_freq`` recompute as the documented fallback — so a lost
    async push degrades to one extra bounded aggregation pass, never to a
    silently wrong table. Sinks are SHARDED (one per ~16 CPUs); a push is
    routed by the hash of its batch key, so a Ray task RETRY lands on the
    same shard and dedups against the ``seen`` key set. The batch key is
    (first doc id, doc count) — unique because extraction batches
    partition docs; a violated assumption shows up as a sum/count
    mismatch at the barrier, not as silent double counting."""

    def __init__(self, n_surfaces: int):
        self.freq = np.zeros(n_surfaces, dtype=np.int64)
        self.seen: set[str] = set()

    def add(self, key: str, sids: np.ndarray, counts: np.ndarray) -> None:
        if key in self.seen:
            return
        self.seen.add(key)
        if len(sids):
            np.add.at(self.freq, sids, counts)

    def totals(self) -> np.ndarray:
        return self.freq


def make_freq_sinks(n_surfaces: int) -> list:
    """One sink per ~16 cluster CPUs (bounded message load per actor)."""
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    n_sinks = max(1, n_cpus // 16)
    return [FreqSink.remote(n_surfaces) for _ in range(n_sinks)]


def freq_totals(
    state: dict, mentions: rd.Dataset, timeout_s: float = 60.0
) -> np.ndarray:
    """Read the G1 frequency table from the side-channel sinks, with the
    completeness barrier: ``mentions`` must be MATERIALIZED (so every
    extraction ``__call__`` has returned and submitted its push) and the
    sink totals must sum to the mention count. Late async pushes are
    polled for briefly; a genuine loss (sink died, push dropped) falls
    back to the ``surface_freq`` recompute over the materialized mentions
    — correctness never depends on delivery."""
    import time as _time

    n_mentions = mentions.count()  # metadata-only on materialized data
    sinks = state["freq_sinks"]
    deadline = _time.time() + timeout_s
    delay = 0.02
    while True:
        arrs = ray.get([s.totals.remote() for s in sinks])
        freq = arrs[0] if len(arrs) == 1 else np.sum(arrs, axis=0)
        if int(freq.sum()) == n_mentions:
            return freq.astype(np.int64)
        if _time.time() >= deadline:
            logger.warning(
                "freq sinks incomplete after %.0fs (%d of %d mentions); "
                "recomputing via surface_freq",
                timeout_s, int(freq.sum()), n_mentions,
            )
            return surface_freq(mentions, len(state["surfaces"]))
        _time.sleep(delay)
        delay = min(delay * 2, 0.5)


class MentionExtractor:
    """Dictionary matcher with per-actor state: the broadcast automaton /
    vectorized dictionary ship once per actor (__init__), not per batch.

    Two equivalent matchers (tested equal in tests/test_vecmatch.py):
    - ``automaton`` (default): per-doc Aho-Corasick scan over normalized
      text with raw-offset remapping. MEASURED FASTER: 20s vs 37s for the
      rolling-hash path at sf0.1/32cpus — one trie walk touches each char
      once, while rolling-hash pays a candidate-verify pass per window
      length.
    - ``vector``: rolling-hash window matching over the batch's
      concatenated byte buffer (functions/vecmatch.py) — all-C array ops
      for ASCII docs; non-ASCII docs fall back to the automaton per doc.
      Kept as the no-per-char-Python alternative (property-tested equal).

    Emits ``sid`` (int32 index into the broadcast surface list — strings
    never enter the mentions table) and ``doc_n`` (number of mention rows
    for the doc, counted while the doc is provably whole inside this one
    call — the downstream resolution invariant check). The M16
    section-exclusion filter applies HERE, before doc_n is counted.

    ``emit_sections=False`` (the flagship path) skips section detection
    entirely when no exclusion filter needs it and drops the ``section``
    string column from the materialized mentions table — the table the
    whole pipeline round-trips through the object store; its bandwidth is
    the measured single-node scaling floor (BASELINE.md)."""

    def __init__(
        self,
        vd_ref,
        exclude_sections: frozenset[str] | None = None,
        matcher: str = "automaton",
        emit_sections: bool = True,
        freq_sinks=None,
    ):
        self.vd = ray.get(vd_ref)
        self._ac: AhoCorasick | None = None
        self.exclude = exclude_sections or frozenset()
        self.matcher = matcher
        self.emit_sections = emit_sections
        self.need_sections = emit_sections or bool(self.exclude)
        self.freq_sinks = freq_sinks
        if matcher == "automaton":
            # eager in the default mode (VERDICT r3 #7): every actor needs
            # the trie on its first batch anyway, and actor construction
            # overlaps with the parquet read — so the ~0.7s/actor build
            # rides the read instead of the first batch's critical path
            _ = self.ac

    @property
    def ac(self) -> AhoCorasick:
        # lazy in vector mode: only actors that actually see non-ASCII
        # fallback docs pay the trie build
        if self._ac is None:
            self._ac = AhoCorasick(
                {s: i for i, s in enumerate(self.vd.surfaces)}
            )
        return self._ac

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n_docs = len(doc_ids)
        if self.matcher == "vector":
            ascii_pos = [i for i, t in enumerate(texts) if t.isascii()]
        else:
            ascii_pos = []
        auto_pos = (
            sorted(set(range(n_docs)) - set(ascii_pos))
            if len(ascii_pos) < n_docs
            else []
        )
        parts = []
        if ascii_pos:
            parts.append(self._vector_part(texts, ascii_pos))
        if auto_pos:
            parts.append(self._automaton_part(texts, auto_pos))
        if parts:
            pos = np.concatenate([p[0] for p in parts])
            start = np.concatenate([p[1] for p in parts])
            end = np.concatenate([p[2] for p in parts])
            sid = np.concatenate([p[3] for p in parts])
            section = np.concatenate([p[4] for p in parts])
        else:
            pos = start = end = sid = np.zeros(0, dtype=np.int64)
            section = np.zeros(0, dtype=object)
        if self.exclude and len(pos):
            keep = ~np.isin(section, list(self.exclude))
            pos, start, end, sid, section = (
                pos[keep], start[keep], end[keep], sid[keep], section[keep]
            )
        # rows grouped per doc (doc-contiguity), deterministic within-doc
        # order; doc_n counted after exclusion
        order = np.lexsort((sid, end, start, pos))
        pos, start, end, sid, section = (
            pos[order], start[order], end[order], sid[order], section[order]
        )
        counts = np.bincount(pos, minlength=n_docs) if len(pos) else np.zeros(n_docs, dtype=np.int64)
        doc_arr = np.array(doc_ids, dtype=object)
        if self.freq_sinks is not None and n_docs:
            # post-exclusion sparse partial; FIRE-AND-FORGET (no ray.get —
            # VERDICT r3 #2: the ACK was a per-batch global serialization
            # point). Delivery is verified downstream by the freq_totals
            # sum==count barrier; key-hash routing makes retries land on
            # the same shard and dedup.
            uniq, cnt = (
                np.unique(sid, return_counts=True)
                if len(sid)
                else (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
            )
            key = f"{doc_ids[0]}|{n_docs}"
            sink = self.freq_sinks[stable_u64(key) % len(self.freq_sinks)]
            sink.add.remote(key, uniq.astype(np.int32), cnt.astype(np.int64))
        cols = {
            "doc_id": pa.array(doc_arr[pos], pa.string()),
            "start": pa.array(start.astype(np.int32)),
            "end": pa.array(end.astype(np.int32)),
            "sid": pa.array(sid.astype(np.int32)),
            "section": pa.array(section, pa.string()),
            "doc_n": pa.array(counts[pos].astype(np.int32)),
        }
        if not self.emit_sections:
            del cols["section"]
        return pa.table(cols)

    def _vector_part(self, texts: list[str], pos_list: list[int]):
        from ..functions.vecmatch import match_ascii_batch

        sub = [texts[i] for i in pos_list]
        doc, start, end, sid, _plural = match_ascii_batch(sub, self.vd)
        if not self.need_sections:
            section = np.full(len(doc), "", dtype=object)
        elif len(doc):
            # vectorized section lookup: global sorted section boundaries
            # (find_sections covers [0, len) per doc, docs are contiguous)
            bases = np.concatenate(
                [[0], np.cumsum([len(t) for t in sub])]
            ).astype(np.int64)
            sec_starts: list[int] = []
            sec_hdrs: list[str] = []
            for i, t in enumerate(sub):
                for h, s, _e in find_sections(t):
                    sec_starts.append(int(bases[i]) + s)
                    sec_hdrs.append(h)
            g_start = start + bases[doc]
            hdr_idx = (
                np.searchsorted(
                    np.array(sec_starts, dtype=np.int64), g_start, side="right"
                )
                - 1
            )
            section = np.array(sec_hdrs, dtype=object)[np.maximum(hdr_idx, 0)]
        else:
            section = np.zeros(0, dtype=object)
        return (
            np.array(pos_list, dtype=np.int64)[doc] if len(doc) else doc,
            start,
            end,
            sid.astype(np.int64),
            section,
        )

    def _automaton_part(self, texts: list[str], pos_list: list[int]):
        out_pos: list[int] = []
        out_start: list[int] = []
        out_end: list[int] = []
        out_sid: list[int] = []
        out_section: list[str] = []
        for p in pos_list:
            raw = texts[p]
            norm, norm2raw = _norm_with_map(raw)
            if not norm:
                continue
            sections = (
                SectionIndex(find_sections(raw)) if self.need_sections else None
            )
            n = len(norm)
            seen: set[tuple[int, int, int]] = set()
            for s, e, pid in self.ac.find_all(norm):
                # word boundaries in norm space, with trailing-plural
                # tolerance (M1 trailing s*): allow one extra 's' before the
                # boundary and absorb it into the span.
                if s > 0 and norm[s - 1] != " ":
                    continue
                if e < n and norm[e] != " ":
                    if norm[e] == "s" and (e + 1 == n or norm[e + 1] == " "):
                        e = e + 1
                    else:
                        continue
                raw_s = int(norm2raw[s])
                raw_e = int(norm2raw[e - 1]) + 1
                # span identity includes the surface id so nested matches at
                # the same offsets stay distinct (they'd otherwise bridge
                # unrelated concepts through one shared node)
                key = (raw_s, raw_e, pid)
                if key in seen:
                    continue
                seen.add(key)
                out_pos.append(p)
                out_start.append(raw_s)
                out_end.append(raw_e)
                out_sid.append(pid)
                out_section.append(
                    sections.header_at(raw_s) if sections is not None else ""
                )
        return (
            np.array(out_pos, dtype=np.int64),
            np.array(out_start, dtype=np.int64),
            np.array(out_end, dtype=np.int64),
            np.array(out_sid, dtype=np.int64),
            np.array(out_section, dtype=object),
        )


DOCS_PER_BLOCK = 2_000  # read-block granularity for the docs table: sized
                        # by DATA (≈2k docs ≈ 1.5MB text per task — fine
                        # packing without per-task overhead), NOT CPU count
                        # (downstream shuffle cost grows with block count,
                        # so tying blocks to CPUs makes more CPUs slower).
                        # Measured at the 1M-doc bench tier: 512 blocks
                        # beats 64 by ~25%.
MAX_DOC_BLOCKS = 512
SHUFFLE_INPUT_BLOCKS = 64  # fixed block count for the block-key sort input


def _doc_blocks(n_docs: int) -> int:
    return max(16, min(MAX_DOC_BLOCKS, n_docs // DOCS_PER_BLOCK or 16))


def doc_bucket_array(doc_ids: list[str]) -> np.ndarray:
    """Stable output-partition bucket per doc (md5-based — identical across
    processes and runs; the checkpoint layout key)."""
    return np.array(
        [stable_u64(d) % N_OUTPUT_PARTITIONS for d in doc_ids], dtype=np.int64
    )


def extract_mentions(
    sf_dir: str,
    exclude_sections: frozenset[str] | None = None,
    matcher: str = "automaton",
    bucket_filter: frozenset[int] | None = None,
    emit_sections: bool = True,
    fuse_freq: bool = False,
):
    """docs → mentions Dataset. ``exclude_sections`` applies the M16
    medication-section filter inside the extractor (off by default: the
    fixture gold plants mentions in all sections).

    ``bucket_filter``: only docs whose output bucket (hash(doc_id) %
    N_OUTPUT_PARTITIONS) is in the set are extracted — the resume path
    filters COMPLETED buckets out at the read, skipping their extraction
    compute entirely, not just their writes.

    ``fuse_freq``: create the sharded ``FreqSink`` side-channel actors
    (``state["freq_sinks"]``) that accumulate the G1 frequency table during
    extraction — once the mentions materialize, ``freq_totals`` replaces
    the separate full read pass ``surface_freq`` would make."""
    spec = fixtures.spec_for_sf_dir(sf_dir)
    fdir = fixtures.fixture_dir(spec)
    state = link_state_cached(fdir)  # one build task per process+fixture
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    from ..sources.docs_io import read_docs

    freq_sinks = None
    if fuse_freq:
        freq_sinks = make_freq_sinks(len(state["surfaces"]))
        state["freq_sinks"] = freq_sinks
    docs = read_docs(
        f"{fdir}/docs.parquet", override_num_blocks=_doc_blocks(spec.n_docs)
    )
    flat = docs.map_batches(flatten_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "text"]
    )
    if bucket_filter is not None and len(bucket_filter) < N_OUTPUT_PARTITIONS:
        keep = np.array(sorted(bucket_filter), dtype=np.int64)

        def filt(t: pa.Table) -> pa.Table:
            b = doc_bucket_array(t["doc_id"].to_pylist())
            return t.filter(pa.array(np.isin(b, keep)))

        flat = flat.map_batches(filt, batch_format="pyarrow")
    mentions = flat.map_batches(
        MentionExtractor,
        fn_constructor_args=(
            state["vd_ref"],
            exclude_sections,
            matcher,
            emit_sections,
            freq_sinks,
        ),
        batch_format="pyarrow",
        # min pool = half the CPUs: autoscaling from 1 ramps too slowly and
        # its latency dominates; leaving half the CPUs keeps read tasks fed
        concurrency=(max(1, n_cpus // 2), n_cpus),
        # whole-block batches: ~2k docs / ~1.5MB text per call, so the
        # vectorized matcher's O(buffer) arrays stay ~15MB per task
        batch_size=None,
    )
    return mentions, state, fdir


def q_mentions(sf_dir: str):
    """Extracted mentions with surfaces restored for presentation (the
    pipeline-internal table carries sid ints only)."""
    mentions, state, _ = extract_mentions(sf_dir)
    surfaces_ref = ray.put(np.array(state["surfaces"], dtype=object))

    class Project:
        def __init__(self):
            self.surfaces = ray.get(surfaces_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "start": df["start"].astype(np.int32),
                    "end": df["end"].astype(np.int32),
                    "surface": self.surfaces[df["sid"].to_numpy()],
                    "section": df["section"],
                }
            )

    return mentions.map_batches(Project, batch_format="pandas", concurrency=(1, 4))


# --------------------------------------------------------------------------
# frequency table (G1) — dictionary-bounded, tree-combined
# --------------------------------------------------------------------------

def surface_freq(mentions: rd.Dataset, n_surfaces: int) -> np.ndarray:
    """Per-sid corpus mention counts. Partial counts per batch (≤ one row
    per distinct sid), tree-combined so the driver sees ≤ n_surfaces rows
    regardless of corpus size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["sid"].value_counts()
        return pd.DataFrame(
            {"sid": vc.index.to_numpy().astype(np.int32),
             "n": vc.to_numpy().astype(np.int64)}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sid", as_index=False)["n"].sum()
        g["sid"] = g["sid"].astype(np.int32)
        return g

    try:
        hint = mentions.num_blocks() or 64
    except Exception:
        hint = 64
    final = tree_to_pandas(
        mentions.map_batches(partial, batch_format="pandas"), combine,
        n_blocks_hint=hint,
    )
    freq = np.zeros(n_surfaces, dtype=np.int64)
    if len(final) and "sid" in final.columns:
        freq[final["sid"].to_numpy()] = final["n"].to_numpy()
    return freq


# --------------------------------------------------------------------------
# blocking + salting + pair generation
# --------------------------------------------------------------------------

def _block_keys_for_surface(surface: str) -> list[str]:
    """Fuzzy blocking keys (char-3gram prefix). The dictionary-EXACT path
    does not go through blocking at all: the dictionary is already a
    broadcast artifact, so exact mention↔concept links enter the candidate
    sets directly (``cand_by_sid`` in ``run_entity_link``: surface →
    dictionary concepts, score 1.0 by construction) and mentions attach via
    the broadcast sid→concept array (``AttachConcept``) — the guide's
    broadcast-join rule. The shuffle below carries only the fuzzy
    candidates that genuinely need cross-corpus co-location."""
    pref = surface[:3]
    return [f"g:{pref}"] if pref else []


def prefix_block_id(prefix: str) -> np.int64:
    """Int64 block id for a char-3gram prefix (shuffle keys are ints:
    sorting/partitioning int64 is several times cheaper than strings).
    Low 4 bits reserved for the salt bucket (N_SALT ≤ 16)."""
    v = 0
    for ch in prefix[:3]:
        v = v * 131 + ord(ch)
    return np.int64(v << 4)


def blocked_sides(
    mentions: rd.Dataset, state: dict, freq_n: np.ndarray
) -> tuple[rd.Dataset, rd.Dataset, set]:
    """Emit (block_key, ...) rows for both sides of the FUZZY path; salt
    hot keys measured from the frequency table: mention rows get
    key#h(mention)%k, concept rows replicate into every salt bucket.
    The shuffle payload is ALL-INT: (block_key:int64, node:int64,
    sid:int32, concept_id:int64)."""
    block_of_sid = state["block_of_sid"]
    if "block_ref" not in state:
        state["block_ref"] = ray.put(block_of_sid)
    block_ref = state["block_ref"]

    # per-block mention frequency, derived driver-side from the
    # dictionary-bounded freq table (block id is a function of the surface)
    key_n: dict[int, int] = {}
    for b, n in zip(block_of_sid, freq_n):
        if n:
            key_n[int(b)] = key_n.get(int(b), 0) + int(n)
    hot = {k for k, n in key_n.items() if n > HOT_KEY_MENTIONS}
    if hot:
        logger.info("salting %d hot block ids: %s", len(hot), sorted(hot)[:5])

    hot_arr_ref = ray.put(np.array(sorted(hot), dtype=np.int64))

    class ExplodeSalt:
        """Vectorized, string-free: one int-only row per mention. Strings
        are recovered from broadcast state on the far side. Hot keys salted
        by a stable per-mention hash."""

        def __init__(self):
            self.hot = ray.get(hot_arr_ref)
            self.block_of_sid = ray.get(block_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sid = df["sid"].to_numpy().astype(np.int32)
            ids = self.block_of_sid[sid]
            node = mention_node_array(df)
            if len(self.hot):
                hot_mask = np.isin(ids, self.hot)
                if hot_mask.any():
                    salts = (node.astype(np.uint64) % np.uint64(N_SALT)).astype(
                        np.int64
                    )
                    ids = ids + np.where(hot_mask, salts, 0)
            return pa.table(
                {
                    "block_key": pa.array(ids, pa.int64()),
                    "node": pa.array(node, pa.int64()),
                    "sid": pa.array(sid, pa.int32()),
                    "concept_id": pa.array(
                        np.full(len(df), -1, dtype=np.int64)
                    ),  # marks the mention side
                }
            )

    # Coalesce the int-only shuffle input to a FIXED small block count: the
    # sort exchange's cost grows superlinearly with input blocks (it creates
    # in×out partition objects — 500 extraction blocks made the sort ~10×
    # slower than 64). The mentions dataset itself keeps its extraction
    # block layout (per-doc contiguity for the resolve path); only this
    # salted projection is coalesced, inside the same lazy execution.
    m_salted = (
        mentions.map_batches(ExplodeSalt, batch_format="pandas", concurrency=(1, 4))
        .repartition(SHUFFLE_INPUT_BLOCKS)
    )

    # concept side: built driver-side from the dictionary (small), replicated
    # into salt buckets for hot keys
    sid_of = {s: i for i, s in enumerate(state["surfaces"])}
    c_rows = {"block_key": [], "node": [], "sid": [], "concept_id": []}
    for surf, cids in state["surface_to_cids"].items():
        if not surf[:3]:
            continue
        base = int(block_of_sid[sid_of[surf]])
        targets = [base + i for i in range(N_SALT)] if base in hot else [base]
        for t in targets:
            for cid in cids:
                c_rows["block_key"].append(t)
                c_rows["node"].append(-1)
                c_rows["sid"].append(sid_of[surf])
                c_rows["concept_id"].append(cid)
    c_keys = rd.from_arrow(
        pa.table(
            {
                "block_key": pa.array(c_rows["block_key"], pa.int64()),
                "node": pa.array(c_rows["node"], pa.int64()),
                "sid": pa.array(c_rows["sid"], pa.int32()),
                "concept_id": pa.array(c_rows["concept_id"], pa.int64()),
            }
        )
    )
    return m_salted, c_keys, hot


def candidate_pairs(m_salted: rd.Dataset, c_keys: rd.Dataset) -> rd.Dataset:
    """groupby(block_key) — the FALLBACK plan's wide shuffle (all-int
    payload; the default broadcast plan has no exchange at all) — then
    within-block mention × concept cross pairs, capped with logged drops."""
    both = m_salted.union(c_keys)

    def pairgen(g: pd.DataFrame) -> pd.DataFrame:
        is_m = g["concept_id"].to_numpy() == -1
        m_node = g["node"].to_numpy()[is_m]
        m_sid = g["sid"].to_numpy()[is_m]
        c_cid = g["concept_id"].to_numpy()[~is_m]
        c_sid = g["sid"].to_numpy()[~is_m]
        if len(m_node) == 0 or len(c_cid) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype=np.int64),
                    "m_sid": pd.Series([], dtype=np.int32),
                    "concept_id": pd.Series([], dtype=np.int64),
                    "c_sid": pd.Series([], dtype=np.int32),
                }
            )
        n_pairs = len(m_node) * len(c_cid)
        if n_pairs > BLOCK_CAP:
            logger.warning(
                "block %s: %d pairs exceeds cap %d; truncating (logged, not silent)",
                g["block_key"].iloc[0],
                n_pairs,
                BLOCK_CAP,
            )
            # deterministic truncation: smallest node ids first
            keep = np.argsort(m_node, kind="stable")[
                : max(1, BLOCK_CAP // max(1, len(c_cid)))
            ]
            m_node, m_sid = m_node[keep], m_sid[keep]
        mi = np.repeat(np.arange(len(m_node)), len(c_cid))
        ci = np.tile(np.arange(len(c_cid)), len(m_node))
        out = pd.DataFrame(
            {
                "node": m_node[mi],
                "m_sid": m_sid[mi],
                "concept_id": c_cid[ci],
                "c_sid": c_sid[ci],
            }
        )
        # same-surface pairs are the exact path's job (already in the
        # candidate sets with score 1.0); the fuzzy path scores only
        # genuine near-misses
        return out[out["m_sid"].to_numpy() != out["c_sid"].to_numpy()]

    return both.groupby("block_key").map_groups(pairgen, batch_format="pandas")


BROADCAST_PAIRGEN_MAX_ROWS = 20_000_000  # concept-side (block, concept) rows
# above which the broadcast plan falls back to the grouped shuffle: the CSR
# is ~20 bytes/row, so the default bounds the broadcast at ~400 MB — SNOMED
# scale (~1M surfaces, ~1.2 concepts each) is 50× under it.


def concept_block_state(state: dict, freq_n: np.ndarray):
    """Driver-built broadcast state for the shuffle-free pair plan:

    - CSR of the concept side keyed by UNSALTED block id: sorted unique
      ``blk_ids`` + offsets into flat ``(c_sid, c_cid)`` arrays. Size is
      dictionary-bounded (one row per (surface, concept) pair) — the
      "broadcast the small side" rule; mentions NEVER shuffle.
    - per-block keep-threshold implementing BLOCK_CAP without co-locating
      the block: from the G1 frequency table the driver knows each block's
      mention count m_b and concept count c_b; when m_b×c_b > BLOCK_CAP a
      uniform node-hash threshold keeps ≈ BLOCK_CAP/c_b mentions (expected;
      the grouped path keeps the exactly-smallest node ids instead — both
      deterministic, both logged, output-neutral while no non-identical
      pair passes θ, which the oracle asserts).
    """
    block_of_sid = state["block_of_sid"]
    s2c = state["surface_to_cids"]
    surfaces = state["surfaces"]
    order = np.argsort(block_of_sid, kind="stable")
    blk_ids_list: list[int] = []
    offs: list[int] = [0]
    c_sid: list[int] = []
    c_cid: list[int] = []
    cur = None
    for i in order:
        b = int(block_of_sid[i])
        if cur is None or b != cur:
            if cur is not None:
                blk_ids_list.append(cur)
                offs.append(len(c_sid))
            cur = b
        for cid in s2c.get(surfaces[i], ()):
            c_sid.append(i)
            c_cid.append(cid)
    if cur is not None:
        blk_ids_list.append(cur)
        offs.append(len(c_sid))
    blk_ids = np.array(blk_ids_list, dtype=np.int64)
    offsets = np.array(offs, dtype=np.int64)
    values_sid = np.array(c_sid, dtype=np.int32)
    values_cid = np.array(c_cid, dtype=np.int64)

    # per-block mention counts from the dictionary-bounded freq table
    m_per_block = np.zeros(len(blk_ids), dtype=np.int64)
    pos_of_sid = np.searchsorted(blk_ids, block_of_sid)
    np.add.at(m_per_block, pos_of_sid, freq_n)
    c_per_block = np.diff(offsets)
    pairs_per_block = m_per_block * c_per_block
    # hot blocks get the same effective budget the grouped plan's salting
    # gives them (N_SALT sub-blocks × BLOCK_CAP each) so candidate
    # coverage is plan-independent; cold blocks get one BLOCK_CAP
    budget = np.where(
        m_per_block > HOT_KEY_MENTIONS, N_SALT * BLOCK_CAP, BLOCK_CAP
    ).astype(np.int64)
    over = pairs_per_block > budget
    # uint64 keep-threshold per block (max = keep everything)
    thr = np.full(len(blk_ids), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if over.any():
        keep_frac = (budget[over] / np.maximum(c_per_block[over], 1)) / np.maximum(
            m_per_block[over], 1
        )
        thr[over] = (np.clip(keep_frac, 1e-9, 1.0) * float(2**64 - 1)).astype(
            np.uint64
        )
        logger.warning(
            "broadcast pairgen: %d blocks exceed their budget (max %d "
            "pairs vs budget %d); capping by node-hash threshold "
            "(logged, not silent)",
            int(over.sum()), int(pairs_per_block.max()),
            int(budget[over].max()),
        )
    return {
        "blk_ids": blk_ids,
        "offsets": offsets,
        "values_sid": values_sid,
        "values_cid": values_cid,
        "thr": thr,
        "n_rows": len(values_sid),
    }


class BroadcastPairGen:
    """Shuffle-free pair generation (the flagship plan): the concept-side
    block CSR ships once per actor; each mention batch emits its own
    mention×concept candidate pairs by broadcast lookup — the groupby
    exchange (sort of every mention row) disappears from the pipeline.
    Output schema/rows match ``candidate_pairs`` exactly while no block
    exceeds BLOCK_CAP (cap subsets differ by plan; both deterministic)."""

    def __init__(self, csr_ref, block_ref):
        csr = ray.get(csr_ref)
        self.blk_ids = csr["blk_ids"]
        self.offsets = csr["offsets"]
        self.values_sid = csr["values_sid"]
        self.values_cid = csr["values_cid"]
        self.thr = csr["thr"]
        self.block_of_sid = ray.get(block_ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sid = df["sid"].to_numpy().astype(np.int32)
        node = mention_node_array(df)
        blocks = self.block_of_sid[sid]
        pos = np.searchsorted(self.blk_ids, blocks)
        if len(pos) and not np.array_equal(self.blk_ids[pos], blocks):
            raise RuntimeError(
                "mention block id missing from concept CSR — dictionary "
                "state and mentions table disagree"
            )
        # cap filter (no-op unless the block is over BLOCK_CAP)
        keep = (
            node.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) <= self.thr[pos]
        if not keep.all():
            sid, node, pos = sid[keep], node[keep], pos[keep]
        reps = (self.offsets[pos + 1] - self.offsets[pos]) if len(pos) else (
            np.zeros(0, dtype=np.int64)
        )
        total = int(reps.sum())
        row_idx = np.repeat(np.arange(len(pos)), reps)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)))[:-1], reps
        )
        c_pos = self.offsets[pos[row_idx]] + within
        m_sid = sid[row_idx]
        c_sid = self.values_sid[c_pos]
        mask = m_sid != c_sid  # same-surface pairs are the exact path's
        return pd.DataFrame(
            {
                "node": node[row_idx][mask],
                "m_sid": m_sid[mask].astype(np.int32),
                "concept_id": self.values_cid[c_pos][mask],
                "c_sid": c_sid[mask].astype(np.int32),
            }
        )


def candidate_pairs_auto(
    mentions: rd.Dataset, state: dict, freq_n: np.ndarray
) -> tuple[rd.Dataset, str]:
    """Pick the pair plan: broadcast (shuffle-free, default — the concept
    side is dictionary-bounded) vs grouped (the groupby exchange, for
    dictionaries too large to broadcast). Returns (pairs, plan_name)."""
    csr = concept_block_state(state, freq_n)
    if csr["n_rows"] > BROADCAST_PAIRGEN_MAX_ROWS:
        m_salted, c_keys, _hot = blocked_sides(mentions, state, freq_n)
        return candidate_pairs(m_salted, c_keys), "grouped"
    if "block_ref" not in state:
        state["block_ref"] = ray.put(state["block_of_sid"])
    csr_ref = ray.put(csr)
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    pairs = mentions.map_batches(
        BroadcastPairGen,
        fn_constructor_args=(csr_ref, state["block_ref"]),
        batch_format="pandas",
        concurrency=(1, max(2, n_cpus // 2)),
    )
    return pairs, "broadcast"


# --------------------------------------------------------------------------
# pair scoring (stateful actor pool — A3 analogue)
# --------------------------------------------------------------------------

class PairScorer:
    """Hybrid score = 0.5·JaroWinkler + 0.5·hash-embedding cosine, computed
    per batch with C++-vectorized string kernels and one numpy einsum.
    Surfaces arrive as int sids; strings and embedding rows come straight
    out of the broadcast state by index (no dict lookups, no cache)."""

    def __init__(self, score_ref):
        self.surfaces, self.surface_emb = ray.get(score_ref)
        self.duck = DuckSimilarity(threads=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df = df.copy()
            df["score"] = pd.Series([], dtype=np.float64)
            return df
        m_sid = df["m_sid"].to_numpy()
        c_sid = df["c_sid"].to_numpy()
        left = self.surfaces[m_sid]
        right = self.surfaces[c_sid]
        sims = self.duck.scores(pa.array(left), pa.array(right))
        cos = np.einsum(
            "ij,ij->i", self.surface_emb[m_sid], self.surface_emb[c_sid]
        )
        score = 0.5 * sims["jw"] + 0.5 * cos
        score[m_sid == c_sid] = 1.0
        df = df.copy()
        df["score"] = score
        return df


def score_pairs(pairs: rd.Dataset, state: dict, apply_threshold: bool = True) -> rd.Dataset:
    if "score_ref" not in state:
        state["score_ref"] = ray.put(
            (np.array(state["surfaces"], dtype=object), state["surface_emb"])
        )
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    scored = pairs.map_batches(
        PairScorer,
        fn_constructor_args=(state["score_ref"],),
        batch_format="pandas",
        concurrency=(max(1, n_cpus // 2), n_cpus),
        batch_size=8192,
        num_cpus=1,
    )
    if not apply_threshold:
        return scored
    return scored.map_batches(
        lambda df: df[df["score"] >= THETA], batch_format="pandas"
    )


def _links_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial for the θ-passing distinct-links reduction:
    distinct passing (m_sid, concept_id) rows + one count row carrying the
    scored-pair tally (schema survives fully-empty pandas blocks)."""
    if len(df) == 0 or "m_sid" not in df.columns:
        return pd.DataFrame(
            {"m_sid": np.array([-1], dtype=np.int64),
             "concept_id": np.array([-1], dtype=np.int64),
             "n": np.array([0], dtype=np.int64)}
        )
    passing = df[df["score"] >= THETA][["m_sid", "concept_id"]].drop_duplicates()
    out = pd.DataFrame(
        {
            "m_sid": passing["m_sid"].to_numpy().astype(np.int64),
            "concept_id": passing["concept_id"].to_numpy().astype(np.int64),
            "n": np.zeros(len(passing), dtype=np.int64),
        }
    )
    count_row = pd.DataFrame(
        {"m_sid": np.array([-1], dtype=np.int64),
         "concept_id": np.array([-1], dtype=np.int64),
         "n": np.array([len(df)], dtype=np.int64)}
    )
    return pd.concat([out, count_row], ignore_index=True)


def fuzzy_links(
    mentions: rd.Dataset, state: dict, freq_n: np.ndarray
) -> tuple[pd.DataFrame, int, str]:
    """θ-passing distinct links + scored-pair count + plan name. Default:
    the shuffle-free broadcast pairgen feeding the scorer pool; falls back
    to the grouped exchange when the concept CSR is too large to
    broadcast.

    Deliberately TWO stages (pairgen pool → scorer pool), not one fused
    actor: an ABAB differential at sf0.1/32cpus measured the fused
    single-stage variant (pairgen+score+partial per mention block) at
    11.3–13.5 s vs 8.3–8.4 s for this two-stage plan — the scorer pool's
    8192-row batches rebalance the skewed per-block pair counts across
    actors, while the fused plan chains each block's whole pair stream
    through one task and straggles. Both stages run in the same streaming
    execution with zero exchanges between them."""
    pairs, plan = candidate_pairs_auto(mentions, state, freq_n)
    scored = score_pairs(pairs, state, apply_threshold=False)
    fp, n = fuzzy_pass_links(scored)
    return fp, n, plan


def fuzzy_pass_links(scored: rd.Dataset) -> tuple[pd.DataFrame, int]:
    """Distinct θ-passing (m_sid, concept_id) links + total scored-pair
    count, in ONE streaming execution. Per-batch partials (distinct pass
    rows + one count row) are tree-combined, so the driver-side result is
    dictionary-bounded regardless of how many pair batches were scored."""
    return _links_reduce(
        scored.map_batches(_links_partial, batch_format="pandas")
    )


def _links_reduce(partials: rd.Dataset) -> tuple[pd.DataFrame, int]:
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        is_count = df["m_sid"].to_numpy() < 0
        total = int(df.loc[is_count, "n"].sum())
        links = df[~is_count].drop_duplicates(["m_sid", "concept_id"])
        count_row = pd.DataFrame(
            {"m_sid": np.array([-1], dtype=np.int64),
             "concept_id": np.array([-1], dtype=np.int64),
             "n": np.array([total], dtype=np.int64)}
        )
        return pd.concat([links, count_row], ignore_index=True)

    final = tree_to_pandas(partials, combine, n_blocks_hint=64)
    final = combine(final)
    is_count = final["m_sid"].to_numpy() < 0
    n_scored = int(final.loc[is_count, "n"].sum())
    return final[~is_count][["m_sid", "concept_id"]], n_scored


# --------------------------------------------------------------------------
# clustering + concept assignment + resolution
# --------------------------------------------------------------------------

def _driver_components(u: list[int], v: list[int]) -> dict[int, int]:
    """Union-find over the CONTRACTED concept graph (dictionary-bounded by
    star contraction, so driver-side numpy is legitimate). Above
    DRIVER_CC_MAX_EDGES the caller switches to the distributed path."""
    from ..stages.components import _collapse

    lab = _collapse(
        pd.DataFrame(
            {"u": np.array(u, dtype=np.int64), "v": np.array(v, dtype=np.int64)}
        )
    )
    return dict(zip(lab["u"], lab["v"]))


def _resolve_frame(g: pd.DataFrame, check_invariant: bool = True) -> pd.DataFrame:
    """Per-doc overlap resolution (D2) over one doc-complete frame.

    Vectorized fast path: a span strictly CONTAINED in another span always
    loses the D2 sweep (shorter effective length) and can never re-add
    (it still overlaps its kept container), so contained spans are dropped
    with a cummax scan. Only docs with STAGGERED overlaps
    (start_i < start_j < end_i < end_j) fall back to the exact python
    sweep — rare, since nested dictionary matches dominate.

    ``check_invariant``: verify each doc is COMPLETE in this frame by
    comparing row counts against ``doc_n`` (stamped at extraction while the
    doc was provably whole). A violation means an upstream block split a
    doc across batches — fail loudly instead of emitting overlaps; the
    ``resolution="grouped"`` path is the fallback."""
    if len(g) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=object),
                "start": pd.Series([], dtype=np.int32),
                "end": pd.Series([], dtype=np.int32),
                "concept_id": pd.Series([], dtype=np.int64),
            }
        )
    if check_invariant and "doc_n" in g.columns:
        counts = g.groupby("doc_id")["doc_n"].agg(["size", "first"])
        bad = counts[counts["size"] != counts["first"]]
        if len(bad):
            raise RuntimeError(
                "doc-contiguity invariant violated: docs "
                f"{list(bad.index[:5])} are split across blocks "
                f"(have {list(bad['size'][:5])} of {list(bad['first'][:5])} "
                "rows in this batch). Use resolution='grouped' for this "
                "layout (blocks split mid-doc at target_max_block_size)."
            )
    g = g.drop_duplicates(["doc_id", "start", "end", "cluster_concept"])
    # D2 order: (start asc, longer first, concept asc)
    g = g.sort_values(
        ["doc_id", "start", "end", "cluster_concept"],
        ascending=[True, True, False, True],
    )
    cummax_end = g.groupby("doc_id")["end"].cummax()
    prev_cummax = cummax_end.groupby(g["doc_id"]).shift().fillna(-1)
    overlapped = (g["start"] < prev_cummax).to_numpy()
    contained = (g["end"] <= prev_cummax).to_numpy()
    staggered = overlapped & ~contained
    bad_docs = set(g.loc[staggered, "doc_id"])
    easy = g[~g["doc_id"].isin(bad_docs)]
    easy_contained = contained[~g["doc_id"].isin(bad_docs).to_numpy()]
    keep = easy[~easy_contained]
    rows = [
        pd.DataFrame(
            {
                "doc_id": keep["doc_id"],
                "start": keep["start"].astype(np.int32),
                "end": keep["end"].astype(np.int32),
                "concept_id": keep["cluster_concept"].astype(np.int64),
            }
        )
    ]
    for doc in sorted(bad_docs):
        d = g[g["doc_id"] == doc]
        spans = [
            {"start": int(s), "end": int(e), "concept_id": int(c)}
            for s, e, c in zip(d["start"], d["end"], d["cluster_concept"])
        ]
        kept = remove_overlaps(spans)
        rows.append(
            pd.DataFrame(
                {
                    "doc_id": doc,
                    "start": np.array([k["start"] for k in kept], dtype=np.int32),
                    "end": np.array([k["end"] for k in kept], dtype=np.int32),
                    "concept_id": np.array(
                        [k["concept_id"] for k in kept], dtype=np.int64
                    ),
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["doc_id", "start", "end"], ignore_index=True)


def compute_link_map(
    mentions: rd.Dataset,
    state: dict,
    timings: dict | None = None,
    freq_n: np.ndarray | None = None,
) -> np.ndarray:
    """The global middle of the flagship: frequency table → salted blocking
    shuffle → pair scoring → θ-passing links → star-contracted clustering →
    majority vote. Returns the per-sid final concept assignment (int64,
    -1 = unobserved). Pure function of (mentions, dictionary state) — the
    checkpointable 'link map' artifact of the resumable pipeline.

    ``freq_n``: pre-computed G1 frequency table (the ``FreqSink``
    side-channel when extraction ran with ``fuse_freq=True``); when None a
    dedicated ``surface_freq`` pass over ``mentions`` computes it (the
    checkpoint-resume path, where extraction may not have run at all)."""
    import time as _time

    from ..stages.components import connected_components

    surfaces = state["surfaces"]
    s2c = state["surface_to_cids"]
    t0 = _time.time()
    if freq_n is None:
        freq_n = surface_freq(mentions, len(surfaces))
    # θ-passing fuzzy LINKS are a pure function of (surface, concept) —
    # the mention-level pairs exist to measure/score the candidate
    # stream at corpus scale; the distinct passing table is dictionary-
    # bounded and tree-combined (driver never sees per-batch partials).
    fuzzy_pass, n_scored, pair_plan = fuzzy_links(mentions, state, freq_n)
    n_exact_pairs = int(
        sum(
            int(freq_n[i]) * len(s2c.get(s, ()))
            for i, s in enumerate(surfaces)
            if freq_n[i]
        )
    )
    if timings is not None:
        timings["t_block_score"] = round(_time.time() - t0, 3)
        timings["n_candidate_pairs"] = n_scored + n_exact_pairs
        timings["pair_plan"] = pair_plan

    # ---- clustering: star-contracted union-find --------------------------
    # The mention↔concept graph is bipartite and mention nodes have their
    # whole edge set determined by their surface (exact candidates ∪
    # θ-passing fuzzy candidates). Star contraction therefore reduces the
    # graph EXACTLY to concept↔concept bridges per CORPUS-OBSERVED surface
    # clique (a never-mentioned surface has no mention star, hence no
    # bridge); union-find runs on that contracted edge list and mention
    # labels are recovered by broadcast lookup — no per-mention node ever
    # enters the shuffle. (Contraction is the standard CC optimization;
    # here it is lossless because candidates(surface) is a total function.)
    t0 = _time.time()
    cand_by_sid: list[list[int]] = [list(s2c.get(s, ())) for s in surfaces]
    for sid, cid in zip(fuzzy_pass["m_sid"], fuzzy_pass["concept_id"]):
        cand_by_sid[int(sid)].append(int(cid))
    cand_by_sid = [sorted(set(c)) for c in cand_by_sid]
    bridges_u: list[int] = []
    bridges_v: list[int] = []
    for i, cands in enumerate(cand_by_sid):
        if len(cands) > 1 and freq_n[i] > 0:
            root = min(cands)
            for c in cands:
                if c != root:
                    bridges_u.append(root)
                    bridges_v.append(c)
    if not bridges_u:
        cluster_of: dict[int, int] = {}
    elif len(bridges_u) <= DRIVER_CC_MAX_EDGES:
        # contracted graph is dictionary-bounded → driver numpy union-find
        cluster_of = _driver_components(bridges_u, bridges_v)
    else:  # pragma: no cover - exercised via stages/components tests
        bridge_ds = rd.from_arrow(
            pa.table(
                {
                    "u": pa.array(bridges_u, pa.int64()),
                    "v": pa.array(bridges_v, pa.int64()),
                }
            )
        )
        labels_pd = connected_components(bridge_ds, n_blocks_hint=1).to_pandas()
        cluster_of = dict(zip(labels_pd["node"], labels_pd["label"]))

    def cluster(cid: int) -> int:
        return int(cluster_of.get(cid, cid))

    # per-cluster modal concept (G2/G6 majority vote, min-cid tiebreak),
    # weighted by mention counts — votes derive from the surface frequency
    # table × candidate sets (identical to counting mention edges)
    vote_n: dict[tuple[int, int], int] = {}
    for i, cands in enumerate(cand_by_sid):
        n = int(freq_n[i])
        if n == 0:
            continue
        for c in cands:
            k = (cluster(c), c)
            vote_n[k] = vote_n.get(k, 0) + n
    modal: dict[int, int] = {}
    best: dict[int, tuple[int, int]] = {}
    for (lab, c), n in sorted(vote_n.items()):
        cur = best.get(lab)
        if cur is None or (-n, c) < cur:
            best[lab] = (-n, c)
            modal[lab] = c

    # final per-sid assignment: min candidate concept → its cluster → the
    # cluster's modal concept; broadcast as a flat int64 array (zero-copy
    # plasma, no pickled dict). Only corpus-observed sids get entries.
    final_sid = np.full(len(surfaces), -1, dtype=np.int64)
    for i, cands in enumerate(cand_by_sid):
        if cands and freq_n[i] > 0:
            final_sid[i] = modal.get(cluster(min(cands)), min(cands))
    if timings is not None:
        timings["t_cluster_vote"] = round(_time.time() - t0, 3)
        timings["n_bridges"] = len(bridges_u)
    return final_sid


def _attach_frame(df: pd.DataFrame, final: np.ndarray) -> pd.DataFrame:
    """Broadcast sid→concept attach; preserves row order/count."""
    cids = final[df["sid"].to_numpy()]
    if (cids < 0).any():
        # every extracted mention's surface is in the dictionary, so every
        # observed sid must have an assignment; a miss would silently break
        # the doc_n resolution invariant
        raise RuntimeError("mention sid without concept assignment")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "start": df["start"],
            "end": df["end"],
            "cluster_concept": cids,
            "doc_n": df["doc_n"],
        }
    )


def run_entity_link(
    sf_dir: str,
    exclude_sections: frozenset[str] | None = None,
    timings: dict | None = None,
    resolution: str = "block",
):
    """Flagship pipeline. When ``timings`` is a dict it is filled with stage
    wall-times and cardinalities (bench instrumentation; adds one count on
    already-materialized data, no extra passes).

    ``resolution``: "block" resolves overlaps per block (no shuffle; the
    doc-contiguity invariant is VERIFIED per batch via doc_n and violations
    raise), "grouped" shuffles by hash(doc_id) buckets first — the fallback
    for layouts where blocks may split mid-doc."""
    import time as _time

    t0 = _time.time()
    # flagship path: no section strings in the materialized mentions table
    # (nothing downstream needs them without an exclusion filter) and the
    # G1 frequency table accumulated as an extraction side-channel — one
    # write pass instead of write + count-read (VERDICT r2 #1a/b)
    mentions, state, fdir = extract_mentions(
        sf_dir,
        exclude_sections,
        emit_sections=False,  # sections are still COMPUTED internally when
                              # exclude_sections needs them, just not emitted
        fuse_freq=True,
    )
    mentions = mentions.materialize()  # reused below (small relative to docs)
    freq_n = freq_totals(state, mentions)
    if timings is not None:
        timings["t_extract"] = round(_time.time() - t0, 3)
        timings["n_mentions"] = mentions.count()

    final_sid = compute_link_map(mentions, state, timings, freq_n=freq_n)
    final_ref = ray.put(final_sid)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        # plain task-based map (no actor pool ramp): the broadcast array is
        # fetched zero-copy from the local plasma store per task
        return _attach_frame(df, ray.get(final_ref))

    if resolution == "grouped":
        # shuffle-based fallback: co-locate each doc's rows by hashed doc
        # bucket (vectorized resolution inside each of the ~256 groups)
        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = attach(df)
            df["rbucket"] = (
                pd.util.hash_pandas_object(df["doc_id"], index=False).to_numpy()
                % np.uint64(256)
            ).astype(np.int64)
            return df

        return (
            mentions.map_batches(add_bucket, batch_format="pandas")
            .groupby("rbucket")
            .map_groups(
                lambda g: _resolve_frame(g, check_invariant=False),
                batch_format="pandas",
            )
            .select_columns(["doc_id", "start", "end", "concept_id"])
        )

    # Per-doc overlap resolution (D2) WITHOUT a shuffle: mention extraction
    # processes each doc wholly inside one batch task and every stage from
    # there to here is a block-preserving map_batches, so all rows of a doc
    # are contiguous within one block. That invariant is VERIFIED per batch
    # (doc_n row counts) — a violation raises instead of emitting overlaps.
    # Attach + resolve fuse into ONE task per block.
    def attach_resolve(df: pd.DataFrame) -> pd.DataFrame:
        return _resolve_frame(attach(df))

    return mentions.map_batches(
        attach_resolve, batch_format="pandas", batch_size=None
    ).select_columns(["doc_id", "start", "end", "concept_id"])


def q_entity_link(sf_dir: str):
    return run_entity_link(sf_dir)


N_OUTPUT_PARTITIONS = 32


def _input_fingerprint(
    sf_dir: str, exclude_sections: frozenset[str] | None
) -> str:
    """Checkpoint input fingerprint: EVERY config knob that changes pipeline
    output must be folded in, or a re-run with different config would skip
    'completed' partitions and keep stale output. Currently: fixture key,
    θ, and the canonicalized section-exclusion set."""
    excl = ",".join(sorted(exclude_sections)) if exclude_sections else ""
    return f"{fixtures.spec_for_sf_dir(sf_dir).key}:theta={THETA}:excl={excl}"


def run_entity_link_checkpointed(
    sf_dir: str, ckpt_root: str, exclude_sections: frozenset[str] | None = None
):
    """Flagship pipeline with resumable partitioned checkpoints
    (north_rule: per-partition lineage + metrics, resume skips COMPUTE).

    Three checkpointed stages, partition key = hash(doc_id) %
    N_OUTPUT_PARTITIONS throughout (the same doc-partitioning every
    per-doc stage relies on):

    1. ``mentions`` — extraction per bucket. On resume, COMPLETED buckets
       are filtered out at the docs read, so their flatten/extract compute
       never runs (not merely their writes).
    2. ``link_map`` — the global sid→concept assignment artifact (the only
       corpus-global stage); cached by fingerprint, recomputed only when
       missing/invalidated, from the checkpointed mentions of ALL buckets
       (so resumed runs are byte-identical to fresh ones).
    3. ``linked_mentions`` — attach + per-bucket overlap resolution fused
       into the partition WRITE (transform runs after the skip check, so
       finished buckets skip the resolve compute too).

    Input fingerprint covers every output-changing config knob. Returns
    stage metrics.
    """
    import json as _json
    import os as _os

    from ..sources.checkpoint import (
        checkpointed_write,
        partition_done,
        read_stage,
    )

    fp = _input_fingerprint(sf_dir, exclude_sections)
    all_buckets = range(N_OUTPUT_PARTITIONS)

    # ---- stage 1: per-bucket mentions ---------------------------------
    missing1 = frozenset(
        b for b in all_buckets
        if not partition_done(ckpt_root, "mentions", str(b), fp)
    )
    state: dict | None = None
    if missing1:
        mentions_new, state, _fdir = extract_mentions(
            sf_dir, exclude_sections, bucket_filter=missing1
        )

        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["bucket"] = doc_bucket_array(list(df["doc_id"]))
            return df

        m_mentions = checkpointed_write(
            mentions_new.map_batches(add_bucket, batch_format="pandas"),
            ckpt_root,
            stage="mentions",
            partition_col="bucket",
            input_fingerprint=fp,
            lineage={
                "input": sf_dir,
                "stages": ["read_docs", "flatten", "sectionize",
                           "extract_mentions"],
            },
        )
    else:
        m_mentions = {"partitions": 0, "rows": 0, "skipped_partitions": 0,
                      "wall_time_s": 0.0}
    m_mentions["buckets_skipped_at_read"] = N_OUTPUT_PARTITIONS - len(missing1)

    # ---- stage 2: link-map artifact -----------------------------------
    lm_dir = _os.path.join(ckpt_root, "link_map")
    lm_meta = _os.path.join(lm_dir, "_META.json")
    lm_npy = _os.path.join(lm_dir, "final_sid.npy")
    final_sid = None
    link_map_cached = False
    if _os.path.exists(lm_meta):
        try:
            with open(lm_meta) as f:
                if _json.load(f).get("input_fingerprint") == fp:
                    final_sid = np.load(lm_npy)
                    link_map_cached = True
        except (OSError, ValueError, _json.JSONDecodeError):
            final_sid = None
    mentions_all = None
    if final_sid is None:
        if state is None:
            state = link_state_cached(
                fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
            )
        mentions_all = read_stage(ckpt_root, "mentions").materialize()
        lm_timings: dict = {}
        final_sid = compute_link_map(mentions_all, state, lm_timings)
        _os.makedirs(lm_dir, exist_ok=True)
        np.save(lm_npy, final_sid)
        with open(lm_meta, "w") as f:
            _json.dump({"input_fingerprint": fp, **lm_timings}, f)

    # ---- stage 3: attach + resolve fused into the partition write -----
    missing3 = frozenset(
        b for b in all_buckets
        if not partition_done(ckpt_root, "linked_mentions", str(b), fp)
    )
    if missing3:
        if mentions_all is None:
            mentions_all = read_stage(ckpt_root, "mentions")
        final_ref = ray.put(final_sid)

        def attach_keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
            out = _attach_frame(df, ray.get(final_ref))
            out["bucket"] = df["bucket"].to_numpy()
            return out

        m_linked = checkpointed_write(
            mentions_all.map_batches(attach_keep_bucket, batch_format="pandas"),
            ckpt_root,
            stage="linked_mentions",
            partition_col="bucket",
            input_fingerprint=fp,
            # groups are doc-complete by the bucket shuffle (bucket is a
            # function of doc_id), so resolution needs no invariant check
            transform=lambda g: _resolve_frame(g, check_invariant=False),
            lineage={
                "input": sf_dir,
                "fixture": fixtures.spec_for_sf_dir(sf_dir).key,
                "theta": THETA,
                "stages": [
                    "read_docs", "flatten", "sectionize", "extract_mentions",
                    "block+salt", "pairgen", "score", "union_find", "vote",
                    "resolve_overlaps",
                ],
            },
        )
    else:
        # nothing to do; report every partition as skipped from manifests
        rows = 0
        for b in all_buckets:
            with open(
                _os.path.join(ckpt_root, "linked_mentions", f"part={b}",
                              "_MANIFEST.json")
            ) as f:
                rows += _json.load(f).get("rows", 0)
        m_linked = {"partitions": N_OUTPUT_PARTITIONS, "rows": rows,
                    "skipped_partitions": N_OUTPUT_PARTITIONS,
                    "wall_time_s": 0.0}

    m_linked["mentions_stage"] = m_mentions
    m_linked["link_map_cached"] = link_map_cached
    return m_linked


def linked_pairs(sf_dir: str) -> pa.Table:
    """(mention_id, concept_id) pairs the pipeline links (score ≥ θ) —
    the table the pairwise-F1 gate evaluates against gold_pairs. The
    emitted mention_id is ``doc:start`` (the gold_pairs id form).

    Candidate sets are broadcast (flattened offsets+values int arrays) and
    exploded per batch with vectorized repeats — no driver-side per-row
    loop; only the final result table (gate-sized) is collected."""
    mentions, state, _ = extract_mentions(
        sf_dir, emit_sections=False, fuse_freq=True
    )
    mentions = mentions.materialize()
    surfaces = state["surfaces"]
    freq_n = freq_totals(state, mentions)
    fuzzy_pass, _n, _plan = fuzzy_links(mentions, state, freq_n)

    cand_sets: list[set[int]] = [
        set(state["surface_to_cids"].get(s, ())) for s in surfaces
    ]
    for sid, cid in zip(fuzzy_pass["m_sid"], fuzzy_pass["concept_id"]):
        cand_sets[int(sid)].add(int(cid))
    # flatten to (offsets, values) for vectorized per-batch explosion
    counts = np.array([len(c) for c in cand_sets], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    values = np.array(
        [c for cs in cand_sets for c in sorted(cs)], dtype=np.int64
    )
    cand_ref = ray.put((offsets, values, counts))

    class Explode:
        def __init__(self):
            self.offsets, self.values, self.counts = ray.get(cand_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sid = df["sid"].to_numpy()
            reps = self.counts[sid]
            row_idx = np.repeat(np.arange(len(df)), reps)
            # index of each exploded element inside its candidate list
            within = np.arange(reps.sum()) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)])[:-1], reps
            )
            cids = self.values[self.offsets[sid[row_idx]] + within]
            ids = (
                df["doc_id"].to_numpy()[row_idx].astype(object)
                + ":"
                + df["start"].to_numpy().astype(str)[row_idx].astype(object)
            )
            return pd.DataFrame(
                {"mention_id": ids, "concept_id": cids}
            ).drop_duplicates()

    out = (
        mentions.map_batches(Explode, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)
