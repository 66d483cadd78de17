"""Flagship pipeline: blocking + pairwise scoring + transitive clustering
(BASELINE.json north_rule; SURVEY.md §7.1 architecture).

Re-expresses the reference winners' shared skeleton — generate mentions →
attach candidate concepts → score → resolve — as record linkage over Arrow:

    docs ──mb──▶ flatten + sectionize (M2/M3, §2.2)
         ──mb-actor──▶ mention extraction: Aho-Corasick over normalized text
                       with raw-offset remapping + trailing-plural tolerance
                       (M1/M4/M18 semantics, 1st Place/src/mimic_common.py:
                       50-71,127-161; 2nd Place/submission/static_dict.py:36-53)
    mentions ──flat──▶ (block_key, row): dictionary key + char-3gram prefix
                       key; HOT KEYS SALTED from a measured frequency table
                       (G1; the reference's "pain" blacklists,
                       1st Place/src/mimic_train.py:30,36-42)
         ──groupby(block_key)──▶ pair generation within block (capped,
                       drops logged — no silent truncation)
    pairs ──mb-actor──▶ hybrid scoring: Jaro-Winkler (DuckDB C++ kernel)
                       + char-3gram hash-embedding cosine (A3 stand-in)
         ──filter(score ≥ θ)──▶ distinct passing (surface, concept) links
    links ──star contraction──▶ concept↔concept cliques per surface →
          distributed union-find (stages/components.py) over the
          contracted graph — EXACT, because a mention's edge set is a
          pure function of its surface, so degree-1 mention nodes
          contract away losslessly
         ──▶ per-cluster majority concept vote (G2/G6, weighted by the
              surface frequency table; 2nd Place/src/static_dict.py:116-122)
         ──▶ broadcast surface→concept attach + per-doc overlap
              resolution (D2, mimic_common.py:170-209; vectorized
              contained-span fast path, exact sweep for staggered docs)
    ──▶ linked mentions (doc_id, start, end, concept_id)

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

logger = logging.getLogger(__name__)

THETA = 0.995         # pair-score threshold (T6-class gate): dictionary-exact
                      # matches score exactly 1.0; 1-edit near-misses top out
                      # ≈0.99·½ + 0.97·½ < 0.995 (measured in tests)
BLOCK_CAP = 20_000    # max pairs generated per block before salting kicks in
HOT_KEY_MENTIONS = 2_000   # mention count above which a block key is salted
N_SALT = 8

MENTION_NODE_FLAG = np.int64(1) << np.int64(62)


def mention_node(mention_id: str) -> np.int64:
    return MENTION_NODE_FLAG | np.int64(stable_u64(mention_id) >> 3)


def mention_nodes(ids: pd.Series) -> np.ndarray:
    """Vectorized mention-node ids. Uses pandas' deterministic-within-a-
    pandas-version string hash (the ids are runtime-internal: every
    consumer in one run derives them through this same function, and no
    node id reaches persisted output — the final table carries concept
    ids only)."""
    h = pd.util.hash_pandas_object(ids, index=False).to_numpy()  # uint64
    return (MENTION_NODE_FLAG | (h >> np.uint64(3)).astype(np.int64)).astype(np.int64)


# --------------------------------------------------------------------------
# dictionary / state build (driver-side; small. At 10^12-doc scale this runs
# in one Ray task and only the ObjectRef moves.)
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
    automaton = AhoCorasick({s: i for i, s in enumerate(surfaces)})
    emb = hash_embed(surfaces)
    return {
        "automaton": automaton,
        "surfaces": surfaces,
        "surface_to_cids": {s: sorted(v) for s, v in surface_to_cids.items()},
        "surface_emb": emb,
    }


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
    gaps = []
    out = []
    for i, arr in enumerate(idx_parts):
        out.append(arr)
        if i + 1 < len(idx_parts):
            out.append(np.array([arr[-1] + 1], dtype=np.int64))  # the join space
    norm2raw = np.concatenate(out)
    assert len(norm2raw) == len(norm)
    _ = gaps
    return norm, norm2raw


class MentionExtractor:
    """Automaton matcher with per-actor state: the broadcast automaton +
    dictionary ship once per actor (__init__), not per batch."""

    def __init__(self, state_ref):
        state = ray.get(state_ref)
        self.ac: AhoCorasick = state["automaton"]
        self.surfaces: list[str] = state["surfaces"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "mention_id": [],
            "doc_id": [],
            "start": [],
            "end": [],
            "surface": [],
            "section": [],
        }
        for doc_id, raw in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            norm, norm2raw = _norm_with_map(raw)
            if not norm:
                continue
            sections = SectionIndex(find_sections(raw))
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
                key = (raw_s, raw_e, pid)
                if key in seen:
                    continue
                seen.add(key)
                # node identity includes end so nested matches at the same
                # start are distinct graph nodes (they'd otherwise bridge
                # unrelated concepts through one shared node)
                out["mention_id"].append(f"{doc_id}:{raw_s}:{raw_e}")
                out["doc_id"].append(doc_id)
                out["start"].append(raw_s)
                out["end"].append(raw_e)
                out["surface"].append(self.surfaces[pid])
                out["section"].append(sections.header_at(raw_s))
        return pa.table(
            {
                "mention_id": pa.array(out["mention_id"], pa.string()),
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "start": pa.array(out["start"], pa.int32()),
                "end": pa.array(out["end"], pa.int32()),
                "surface": pa.array(out["surface"], pa.string()),
                "section": pa.array(out["section"], pa.string()),
            }
        )


def extract_mentions(sf_dir: str, exclude_sections: frozenset[str] | None = None):
    """docs → mentions Dataset. ``exclude_sections`` applies the M16
    medication-section filter when given (off by default: the fixture gold
    plants mentions in all sections)."""
    fdir = fixtures.fixture_dir(fixtures.spec_for_sf_dir(sf_dir))
    state_ref = ray.put(build_link_state(fdir))
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    # Block count is FIXED (not CPU-derived): downstream sort/shuffle cost
    # depends on block count, so tying it to CPUs makes more CPUs slower.
    docs = rd.read_parquet(f"{fdir}/docs.parquet", override_num_blocks=64)
    flat = docs.map_batches(flatten_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "text"]
    )
    mentions = flat.map_batches(
        MentionExtractor,
        fn_constructor_args=(state_ref,),
        batch_format="pyarrow",
        # min pool = half the CPUs: autoscaling from 1 ramps too slowly and
        # its latency dominates; leaving half the CPUs keeps read tasks fed
        concurrency=(max(1, n_cpus // 2), n_cpus),
        batch_size=128,
    )
    if exclude_sections:
        excl = list(exclude_sections)
        mentions = mentions.map_batches(
            lambda t: t.filter(
                pa.compute.invert(pa.compute.is_in(t["section"], value_set=pa.array(excl)))
            ),
            batch_format="pyarrow",
        )
    return mentions, state_ref, fdir


def q_mentions(sf_dir: str):
    m, _, _ = extract_mentions(sf_dir)
    return m


# --------------------------------------------------------------------------
# blocking + salting + pair generation
# --------------------------------------------------------------------------

def _block_keys_for_surface(surface: str) -> list[str]:
    """Fuzzy blocking keys (char-3gram prefix). The dictionary-EXACT path
    does not go through blocking at all: the dictionary is already a
    broadcast artifact, so exact mention↔concept links enter the candidate
    sets directly (``cand_by_sid`` in ``run_entity_link``: surface →
    dictionary concepts, score 1.0 by construction) and mentions attach via
    the broadcast surface→concept map (``AttachConcept``) — the guide's
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


def blocked_sides(mentions: rd.Dataset, state_ref) -> tuple[rd.Dataset, rd.Dataset, set]:
    """Emit (block_key, ...) rows for both sides of the FUZZY path; measure
    mention-side key frequencies (G1) and salt hot keys: mention rows get
    key#h(mention)%k, concept rows replicate into every salt bucket.

    The frequency table is a tiny partial-count aggregate over SURFACES
    (bounded by dictionary size, not corpus size); per-key frequencies are
    derived from it driver-side since every block key is a function of the
    surface. One vectorized pass then explodes + salts in the same stage.
    """

    def surf_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["surface"].value_counts()
        return pd.DataFrame(
            {"surface": vc.index, "n": vc.to_numpy().astype(np.int64)}
        )

    # Distributed partial counts per batch; the final combine runs driver-
    # side because its size is bounded by the DICTIONARY (≤ #surfaces per
    # batch-partial), not the corpus — the guide's "small result" rule.
    freq = (
        mentions.map_batches(surf_counts, batch_format="pandas")
        .to_pandas()
        .groupby("surface", as_index=False)["n"]
        .sum()
    )
    key_n: dict[int, int] = {}
    for s, n in zip(freq["surface"], freq["n"]):
        if s[:3]:
            k = int(prefix_block_id(s[:3]))
            key_n[k] = key_n.get(k, 0) + int(n)
    hot = {k for k, n in key_n.items() if n > HOT_KEY_MENTIONS}
    if hot:
        logger.info("salting %d hot block ids: %s", len(hot), sorted(hot)[:5])

    hot_ref = ray.put(hot)

    class ExplodeSalt:
        """Vectorized: one int-only row per mention — (block_key, node,
        sid). The shuffle carries NO strings: node = stable mention-node id,
        sid = index into the broadcast surfaces list (strings are recovered
        from broadcast state on the far side). Hot keys salted by a stable
        per-mention hash."""

        def __init__(self):
            self.hot = ray.get(hot_ref)
            self.sid = {
                s: np.int32(i) for i, s in enumerate(ray.get(state_ref)["surfaces"])
            }

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            surf = df["surface"].astype(str)
            pref = surf.str[:3]
            codes, uniques = pd.factorize(pref)
            ids = np.array([prefix_block_id(u) for u in uniques], dtype=np.int64)[codes]
            if self.hot:
                hot_mask = np.isin(ids, list(self.hot))
                if hot_mask.any():
                    salts = (
                        pd.util.hash_pandas_object(
                            df["mention_id"], index=False
                        ).to_numpy()
                        % N_SALT
                    ).astype(np.int64)
                    ids = ids + np.where(hot_mask, salts, 0)
            s_codes, s_uniq = pd.factorize(surf)
            sid_map = np.array([self.sid.get(u, -1) for u in s_uniq], dtype=np.int32)
            n = len(df)
            return pa.table(
                {
                    "block_key": pa.array(ids, pa.int64()),
                    "node": pa.array(mention_nodes(df["mention_id"])),
                    "sid": pa.array(sid_map[s_codes], pa.int32()),
                    "concept_id": pa.array(
                        np.full(n, -1, dtype=np.int64)
                    ),  # marks the mention side
                }
            )

    m_salted = mentions.map_batches(ExplodeSalt, batch_format="pandas", concurrency=(1, 4))

    # concept side: built driver-side from the dictionary (small), replicated
    # into salt buckets for hot keys
    state = ray.get(state_ref)
    sid_of = {s: i for i, s in enumerate(state["surfaces"])}
    c_rows = {"block_key": [], "node": [], "sid": [], "concept_id": []}
    for surf, cids in state["surface_to_cids"].items():
        if not surf[:3]:
            continue
        base = int(prefix_block_id(surf[:3]))
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
    return m_salted, c_keys, hot, freq


def candidate_pairs(m_salted: rd.Dataset, c_keys: rd.Dataset) -> rd.Dataset:
    """groupby(block_key) — THE wide shuffle, all-int payload — then
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
        # same-surface pairs are the exact path's job (already emitted with
        # score 1.0); the fuzzy path scores only genuine near-misses
        return out[out["m_sid"].to_numpy() != out["c_sid"].to_numpy()]

    return both.groupby("block_key").map_groups(pairgen, batch_format="pandas")


# --------------------------------------------------------------------------
# pair scoring (stateful actor pool — A3 analogue)
# --------------------------------------------------------------------------

class PairScorer:
    """Hybrid score = 0.5·JaroWinkler + 0.5·hash-embedding cosine, computed
    per batch with C++-vectorized string kernels and one numpy einsum.
    Surfaces arrive as int sids; strings and embedding rows come straight
    out of the broadcast state by index (no dict lookups, no cache)."""

    def __init__(self, state_ref):
        state = ray.get(state_ref)
        self.surfaces = np.array(state["surfaces"], dtype=object)
        self.surface_emb = state["surface_emb"]
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


def score_pairs(pairs: rd.Dataset, state_ref, apply_threshold: bool = True) -> rd.Dataset:
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    scored = pairs.map_batches(
        PairScorer,
        fn_constructor_args=(state_ref,),
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


# --------------------------------------------------------------------------
# clustering + concept assignment + resolution
# --------------------------------------------------------------------------

def _passing_sid_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Distinct θ-passing (m_sid, concept_id) rows; tolerant of schemaless
    empty blocks (Ray drops the schema of fully-empty pandas blocks)."""
    if len(df) == 0 or "m_sid" not in df.columns:
        return pd.DataFrame(
            {
                "m_sid": pd.Series([], dtype=np.int32),
                "concept_id": pd.Series([], dtype=np.int64),
            }
        )
    return df[df["score"] >= THETA][["m_sid", "concept_id"]].drop_duplicates()


def run_entity_link(
    sf_dir: str,
    exclude_sections: frozenset[str] | None = None,
    timings: dict | None = None,
):
    """Flagship pipeline. When ``timings`` is a dict it is filled with stage
    wall-times and cardinalities (bench instrumentation; adds one count on
    already-materialized data, no extra passes)."""
    import time as _time

    from ..stages.components import connected_components

    t0 = _time.time()
    mentions, state_ref, fdir = extract_mentions(sf_dir, exclude_sections)
    mentions = mentions.materialize()  # reused below (small relative to docs)
    if timings is not None:
        timings["t_extract"] = round(_time.time() - t0, 3)
        timings["n_mentions"] = mentions.count()

    t0 = _time.time()
    m_salted, c_keys, _hot, freq = blocked_sides(mentions, state_ref)
    pairs = candidate_pairs(m_salted, c_keys)
    scored_all = score_pairs(pairs, state_ref, apply_threshold=False).materialize()
    # θ-passing fuzzy LINKS are a pure function of (surface, concept) —
    # the mention-level pairs above exist to measure/score the candidate
    # stream at corpus scale; the distinct passing table is dictionary-
    # bounded, so its partial-distinct per batch concatenates driver-side.
    fuzzy_pass = (
        scored_all.map_batches(_passing_sid_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if "m_sid" not in fuzzy_pass.columns:  # all-empty dataset loses schema
        fuzzy_pass = pd.DataFrame({"m_sid": [], "concept_id": []})
    state = ray.get(state_ref)
    surfaces = state["surfaces"]
    s2c = state["surface_to_cids"]
    n_exact_pairs = int(
        sum(int(n) * len(s2c.get(s, ())) for s, n in zip(freq["surface"], freq["n"]))
    )
    if timings is not None:
        timings["t_block_score"] = round(_time.time() - t0, 3)
        timings["n_candidate_pairs"] = scored_all.count() + n_exact_pairs

    # ---- clustering: star-contracted union-find --------------------------
    # The mention↔concept graph is bipartite and mention nodes have their
    # whole edge set determined by their surface (exact candidates ∪
    # θ-passing fuzzy candidates). Star contraction therefore reduces the
    # graph EXACTLY to concept↔concept bridges per surface clique; the
    # distributed union-find runs on that contracted edge list and mention
    # labels are recovered by broadcast lookup — no per-mention node ever
    # enters the shuffle. (Contraction is the standard CC optimization;
    # here it is lossless because candidates(surface) is a total function.)
    t0 = _time.time()
    freq_by_surface = dict(zip(freq["surface"], freq["n"]))
    cand_by_sid: list[list[int]] = [list(s2c.get(s, ())) for s in surfaces]
    for sid, cid in zip(fuzzy_pass["m_sid"], fuzzy_pass["concept_id"]):
        cand_by_sid[int(sid)].append(int(cid))
    cand_by_sid = [sorted(set(c)) for c in cand_by_sid]
    # Bridges come ONLY from corpus-observed surfaces (freq > 0): star
    # contraction contracts MENTION stars, and a surface with zero corpus
    # mentions has no star — a never-mentioned multi-concept dictionary
    # surface must not union its concepts (it would let the modal vote
    # reassign mentions of unrelated surfaces). The fuzzy path is already
    # corpus-conditional by construction.
    bridges_u: list[int] = []
    bridges_v: list[int] = []
    for s, cands in zip(surfaces, cand_by_sid):
        if len(cands) > 1 and int(freq_by_surface.get(s, 0)) > 0:
            root = min(cands)
            for c in cands:
                if c != root:
                    bridges_u.append(root)
                    bridges_v.append(c)
    if bridges_u:
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
    else:
        cluster_of = {}

    def cluster(cid: int) -> int:
        return int(cluster_of.get(cid, cid))

    # per-cluster modal concept (G2/G6 majority vote, min-cid tiebreak),
    # weighted by mention counts — votes derive from the surface frequency
    # table × candidate sets (identical to counting mention edges)
    vote_n: dict[tuple[int, int], int] = {}
    for s, cands in zip(surfaces, cand_by_sid):
        n = int(freq_by_surface.get(s, 0))
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

    # final per-surface assignment: min candidate concept → its cluster →
    # the cluster's modal concept; broadcast as a plain surface→concept map.
    # Only corpus-observed surfaces get entries (mentions carry observed
    # surfaces only, and the map ships to every attach actor).
    final_of_surface = {
        s: modal.get(cluster(min(cands)), min(cands))
        for s, cands in zip(surfaces, cand_by_sid)
        if cands and int(freq_by_surface.get(s, 0)) > 0
    }
    final_ref = ray.put(final_of_surface)
    if timings is not None:
        timings["t_cluster_vote"] = round(_time.time() - t0, 3)
        timings["n_bridges"] = len(bridges_u)

    class AttachConcept:
        def __init__(self):
            self.final = ray.get(final_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            cids = df["surface"].map(self.final)
            ok = cids.notna().to_numpy()
            out = pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "start": df["start"],
                    "end": df["end"],
                    "cluster_concept": cids.fillna(-1).astype(np.int64),
                }
            )
            return out[ok]

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    linked = mentions.map_batches(
        AttachConcept, batch_format="pandas", concurrency=(1, max(4, n_cpus // 2))
    )

    # Per-doc overlap resolution (D2) WITHOUT a shuffle: mention extraction
    # processes each doc wholly inside one batch task, and every stage from
    # there to here is a block-preserving map_batches — so all rows of a doc
    # are contiguous within one block, and per-block resolution is
    # doc-complete. (If an upstream repartition ever broke that invariant,
    # the grouped fallback would be groupby(hash(doc_id)%B).map_groups.)
    #
    # Vectorized fast path: a span strictly CONTAINED in another span always
    # loses the D2 sweep (shorter effective length) and can never re-add
    # (it still overlaps its kept container), so contained spans are dropped
    # with a cummax scan. Only docs with STAGGERED overlaps
    # (start_i < start_j < end_i < end_j) fall back to the exact python
    # sweep — rare, since nested dictionary matches dominate.
    def resolve_bucket(g: pd.DataFrame) -> pd.DataFrame:
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

    return linked.map_batches(resolve_bucket, batch_format="pandas").select_columns(
        ["doc_id", "start", "end", "concept_id"]
    )


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
    """Flagship pipeline with resumable partitioned output (north_rule).

    Output partition key = hash(doc_id) % N_OUTPUT_PARTITIONS — the same
    doc-partitioning every per-doc stage relies on, so a resumed run can
    skip finished partitions. Input fingerprint = fixture key + θ, so a
    config change invalidates the checkpoint. Returns stage metrics.
    """
    from ..sources.checkpoint import checkpointed_write

    fp = _input_fingerprint(sf_dir, exclude_sections)
    linked = run_entity_link(sf_dir, exclude_sections)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = [
            stable_u64(d) % N_OUTPUT_PARTITIONS for d in df["doc_id"]
        ]
        return df

    bucketed = linked.map_batches(add_bucket, batch_format="pandas")
    return checkpointed_write(
        bucketed,
        ckpt_root,
        stage="linked_mentions",
        partition_col="bucket",
        input_fingerprint=fp,
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


def linked_pairs(sf_dir: str) -> pa.Table:
    """(mention_id, concept_id) pairs the pipeline links (score ≥ θ) —
    the table the pairwise-F1 gate evaluates against gold_pairs. The
    emitted mention_id is ``doc:start`` (the gold_pairs id form); internal
    ids also carry the span end."""
    mentions, state_ref, _ = extract_mentions(sf_dir)
    mentions = mentions.materialize()
    m_salted, c_keys, _hot, _freq = blocked_sides(mentions, state_ref)
    pairs = candidate_pairs(m_salted, c_keys)
    fuzzy_pass = (
        score_pairs(pairs, state_ref, apply_threshold=False)
        .map_batches(_passing_sid_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if "m_sid" not in fuzzy_pass.columns:  # all-empty dataset loses schema
        fuzzy_pass = pd.DataFrame({"m_sid": [], "concept_id": []})
    state = ray.get(state_ref)
    cands: dict[str, set[int]] = {
        s: set(state["surface_to_cids"].get(s, ())) for s in state["surfaces"]
    }
    for sid, cid in zip(fuzzy_pass["m_sid"], fuzzy_pass["concept_id"]):
        cands[state["surfaces"][int(sid)]].add(int(cid))

    m_pd = mentions.to_pandas()
    rows_id: list[str] = []
    rows_cid: list[int] = []
    for doc, start, surf in zip(m_pd["doc_id"], m_pd["start"], m_pd["surface"]):
        for cid in cands.get(surf, ()):
            rows_id.append(f"{doc}:{start}")
            rows_cid.append(cid)
    out = pd.DataFrame({"mention_id": rows_id, "concept_id": rows_cid}).drop_duplicates()
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
