"""Deterministic synthetic fixtures (FIXTURES.md; SURVEY.md §5 target test plan).

Pure function of ``(seed, n_docs, n_concepts)`` — no external data, no wall
clock. Mirrors the reference's data contracts: clinical-note-like docs with
``Header:`` sections (1st Place/src/mimic_common.py:14-36), planted mention
surfaces that are whitespace/hyphen variants of concept names
(1st Place/src/mimic_common.py:50-71 tolerant patterns), a skewed "hot"
surface (``pain``) planted in ~30% of docs to exercise salted shuffles
(1st Place/src/mimic_train.py:30,36-42 frequency blacklists), and interleaved
``media`` spans per BASELINE.json ``input_hint``.

Tables produced (Arrow, written as parquet under a content-keyed /tmp dir):
    docs(doc_id, spans)             gold_mentions(doc_id,start,end,concept_id,section,surface)
    concepts(concept_id,name,kind,hierarchy)
    gold_pairs(block_key,left_id,right_id,label)
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas
from .functions.text import normalize_text

# Fixed header list modeled on 1st Place/src/mimic_common.py:14-36.
HEADERS = [
    "Chief Complaint",
    "History of Present Illness",
    "Past Medical History",
    "Social History",
    "Family History",
    "Physical Exam",
    "Pertinent Results",
    "Brief Hospital Course",
    "Medications on Admission",
    "Discharge Medications",
    "Discharge Disposition",
    "Discharge Diagnosis",
    "Discharge Condition",
    "Discharge Instructions",
    "Followup Instructions",
    "Allergies",
    "Major Surgical or Invasive Procedure",
    "Review of Systems",
    "Imaging",
    "Impression",
]

# Sections whose mentions are dropped (M16 semantics,
# 2nd Place/submission/first_stage_postprocess.py:82-90).
EXCLUDED_SECTIONS = {"Medications on Admission", "Discharge Medications"}

# Concept-name syllables and filler vocab are DISJOINT so dictionary matches
# are exactly the planted mentions (plus deliberate collisions below).
_CONCEPT_SYLLABLES = [
    "card", "derm", "oss", "neur", "gastr", "pulm", "ren", "hep", "glyc",
    "sten", "fibr", "lip", "myo", "arthr", "cephal", "cyst", "thromb",
    "scler", "trophy", "algia", "itis", "osis", "emia", "pathy", "ectomy",
]
_FILLER_WORDS = [
    "the", "patient", "was", "noted", "to", "have", "stable", "vitals",
    "and", "denies", "recent", "travel", "review", "completed", "plan",
    "continue", "current", "regimen", "followup", "scheduled", "with",
    "primary", "team", "no", "acute", "events", "overnight", "tolerating",
    "diet", "ambulating", "without", "assistance", "labs", "within",
    "normal", "limits", "will", "monitor", "closely", "for", "changes",
]

HOT_SURFACE = "pain"  # planted in ~30% of docs; the skew driver
HOT_CONCEPT_ID = 22_253_000  # SCTID for "Pain (finding)" analogue

_HIERARCHIES = ["finding", "procedure", "body structure"]


def _concept_words(rng: np.random.Generator, n: int) -> list[str]:
    """Deterministic synthetic medical-ish vocabulary, all distinct."""
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < n:
        k = int(rng.integers(2, 4))
        w = "".join(rng.choice(_CONCEPT_SYLLABLES, size=k))
        if w not in seen and w not in _FILLER_WORDS:
            seen.add(w)
            words.append(w)
    return words


def _typo(rng: np.random.Generator, name: str) -> str:
    """One-edit decoy surface (near-miss negative for gold_pairs)."""
    i = int(rng.integers(0, len(name)))
    ch = chr(ord("a") + int(rng.integers(0, 26)))
    op = int(rng.integers(0, 3))
    if op == 0:  # substitute
        out = name[:i] + ch + name[i + 1 :]
    elif op == 1:  # delete
        out = name[:i] + name[i + 1 :]
    else:  # insert
        out = name[:i] + ch + name[i:]
    return out if out != name and out.strip() else name + "x"


FIXTURE_VERSION = 4  # bump when generation logic changes (invalidates cache)

# Small row groups so read_parquet can split one file into many parallel
# read tasks (one giant row group = one block = no read parallelism).
ROW_GROUP_SIZE = 512

# Tables at/above this row count are sharded into multiple files (a single
# parquet file reads as ONE task; a directory of shards reads in parallel).
SHARD_ROWS = 4096
N_SHARDS = 32


@dataclass(frozen=True)
class FixtureSpec:
    seed: int = 42
    n_docs: int = 200
    n_concepts: int = 300

    @property
    def key(self) -> str:
        return f"v{FIXTURE_VERSION}_seed{self.seed}_d{self.n_docs}_c{self.n_concepts}"


def spec_for_sf_dir(sf_dir: str) -> FixtureSpec:
    """Map a testdata sf dir to a fixture scale (deterministic).

    ``SCEL_BENCH_DOCS`` overrides the bench-tier doc count — used by
    ``bench.py --scaling`` to run both parallelism levels on a larger,
    compute-dominated input (same input at both levels, per the scaling
    criterion)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    # bench tier (sf0.1) uses ≥100k docs per FIXTURES.md so compute, not
    # per-stage fixed overhead, dominates the scaling measurement
    scale = {"sf0.001": (200, 300), "sf0.01": (2000, 1000), "sf0.1": (300000, 5000)}.get(
        name, (200, 300)
    )
    n_docs = scale[0]
    if name == "sf0.1" and os.environ.get("SCEL_BENCH_DOCS"):
        n_docs = int(os.environ["SCEL_BENCH_DOCS"])
    return FixtureSpec(seed=42, n_docs=n_docs, n_concepts=scale[1])


def build_concepts(spec: FixtureSpec) -> pa.Table:
    """Terminology table: FSN + synonym expansion rows + 1-edit decoys.

    Synonym shapes mirror the word-permutation / word-replacement expanders
    (1st Place/src/mimic_train.py:198-240).
    """
    rng = np.random.default_rng(spec.seed + 1)
    words = _concept_words(rng, max(60, spec.n_concepts // 3))
    rows: list[tuple[int, str, str, str]] = []
    # Global surface uniqueness: accidental shared surfaces would merge
    # unrelated concepts' clusters (transitive closure is working as
    # designed); the ONE deliberate collision below stays the only one.
    used: set[str] = set()

    rows.append((HOT_CONCEPT_ID, HOT_SURFACE, "FSN", "finding"))
    used.add(HOT_SURFACE)

    for i in range(spec.n_concepts):
        cid = 100_000_000 + i * 9 + (i % 7)  # SCTID-like, deterministic, unique
        name = None
        for _attempt in range(20):
            nw = int(rng.integers(1, 4))
            parts = [words[int(rng.integers(0, len(words)))] for _ in range(nw)]
            cand = " ".join(parts)
            if cand not in used:
                name = cand
                break
        if name is None:
            continue
        used.add(name)
        hier = _HIERARCHIES[int(rng.integers(0, 3))]
        rows.append((cid, name, "FSN", hier))
        # synonyms: permutation ("X of Y" -> "Y X") and replacement variants
        if nw >= 2 and rng.random() < 0.5:
            syn = " ".join(reversed(parts))
            if syn not in used:
                used.add(syn)
                rows.append((cid, syn, "SYN", hier))
        if rng.random() < 0.3:
            syn = name + " disorder"
            if syn not in used:
                used.add(syn)
                rows.append((cid, syn, "SYN", hier))
        # decoy concept with a 1-edit name (near-miss negative)
        if rng.random() < 0.15:
            dec = _typo(rng, name)
            if dec not in used:
                used.add(dec)
                rows.append((cid + 500_000_000, dec, "FSN", hier))

    # deliberate collision: same surface mapped to 2 concepts (exercises the
    # majority vote, 2nd Place/src/static_dict.py:116-122) — keep rare and
    # deterministic.
    rows.append((900_000_001, rows[1][1], "SYN", "procedure"))

    cols = list(zip(*rows))
    return pa.table(
        {
            "concept_id": pa.array(cols[0], pa.int64()),
            "name": pa.array(cols[1], pa.string()),
            "kind": pa.array(cols[2], pa.string()),
            "hierarchy": pa.array(cols[3], pa.string()),
        },
        schema=schemas.CONCEPTS,
    )


def _surface_variant(rng: np.random.Generator, name: str) -> str:
    """Whitespace/hyphen variants the tolerant matcher must catch (M1)."""
    r = rng.random()
    if " " in name:
        if r < 0.2:
            return name.replace(" ", "  ", 1)  # double space
        if r < 0.4:
            return name.replace(" ", "-", 1)  # hyphen
        if r < 0.5:
            return name.replace(" ", " / ", 1)  # slash form
    if r < 0.6:
        return name + "s"  # trailing plural (M1 trailing s*)
    return name


def build_docs_and_gold(spec: FixtureSpec, concepts: pa.Table):
    """Docs with interleaved text/media spans + planted gold mentions."""
    rng = np.random.default_rng(spec.seed + 2)
    fsn = concepts.filter(
        pa.compute.and_(
            pa.compute.equal(concepts["kind"], "FSN"),
            pa.compute.less(concepts["concept_id"], 500_000_000),
        )
    )
    names = fsn["name"].to_pylist()
    cids = fsn["concept_id"].to_pylist()
    # hot concept first (index of HOT_SURFACE)
    plantable = [(c, n) for c, n in zip(cids, names) if n != HOT_SURFACE]

    doc_ids: list[str] = []
    doc_spans: list[list[dict]] = []
    gm_rows: list[tuple] = []

    for d in range(spec.n_docs):
        doc_id = f"doc-{d:06d}"
        n_sections = int(rng.integers(3, 9))
        hdr_idx = rng.permutation(len(HEADERS))[:n_sections]
        # sentence stream with char offsets
        text_parts: list[str] = []
        pos = 0
        planted: list[tuple[int, int, int, str, str]] = []  # start,end,cid,section,surface
        sentence_bounds: list[int] = []  # candidate media insertion offsets

        n_ment = int(rng.integers(1, 7))
        ment_sections = set(int(x) for x in rng.integers(0, n_sections, size=n_ment))
        hot_here = rng.random() < 0.30

        for si, hi in enumerate(hdr_idx):
            header = HEADERS[int(hi)]
            htext = header + ":\n"
            text_parts.append(htext)
            pos += len(htext)
            n_sent = int(rng.integers(1, 4))
            for sj in range(n_sent):
                nw = int(rng.integers(6, 13))
                sent_words = list(rng.choice(_FILLER_WORDS, size=nw))
                sent = " ".join(sent_words)
                # plant a mention mid-sentence
                if si in ment_sections and sj == 0 and plantable:
                    ci = int(rng.integers(0, len(plantable)))
                    cid, name = plantable[ci]
                    surface = _surface_variant(rng, name)
                    prefix = sent + " "
                    start = pos + len(prefix)
                    end = start + len(surface)
                    planted.append((start, end, cid, header, surface))
                    sent = prefix + surface
                if hot_here and si == min(ment_sections or {0}) and sj == n_sent - 1:
                    prefix = sent + " "
                    start = pos + len(prefix)
                    end = start + len(HOT_SURFACE)
                    planted.append((start, end, HOT_CONCEPT_ID, header, HOT_SURFACE))
                    sent = prefix + HOT_SURFACE
                    hot_here = False
                sent = sent + ".\n"
                text_parts.append(sent)
                pos += len(sent)
                sentence_bounds.append(pos)

        full_text = "".join(text_parts)
        # split text into 1-4 text spans at sentence bounds; insert 0-3 media spans
        n_media = int(rng.integers(0, 4))
        cut_pool = sentence_bounds[:-1] if len(sentence_bounds) > 1 else []
        n_cuts = min(int(rng.integers(0, 4)), len(cut_pool))
        cuts = sorted(
            int(cut_pool[i]) for i in rng.permutation(len(cut_pool))[:n_cuts]
        ) if n_cuts else []
        bounds = [0] + cuts + [len(full_text)]
        spans: list[dict] = []
        media_slots = set(
            int(x) for x in rng.integers(0, len(bounds) - 1, size=n_media)
        )
        for bi in range(len(bounds) - 1):
            a, b = bounds[bi], bounds[bi + 1]
            spans.append({"kind": "text", "text": full_text[a:b], "media_ref": "", "offset": a})
            if bi in media_slots:
                ref = f"media://{zlib.crc32(f'{doc_id}:{bi}'.encode()) & 0xFFFFFFFF:08x}"
                spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": b})

        doc_ids.append(doc_id)
        doc_spans.append(spans)
        for start, end, cid, header, surface in sorted(planted):
            gm_rows.append((doc_id, start, end, cid, header, surface))

    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(doc_spans, pa.list_(schemas.SPAN_STRUCT)),
        },
        schema=schemas.DOCS,
    )
    if gm_rows:
        g = list(zip(*gm_rows))
    else:  # pragma: no cover
        g = [[], [], [], [], [], []]
    gold = pa.table(
        {
            "doc_id": pa.array(g[0], pa.string()),
            "start": pa.array(g[1], pa.int32()),
            "end": pa.array(g[2], pa.int32()),
            "concept_id": pa.array(g[3], pa.int64()),
            "section": pa.array(g[4], pa.string()),
            "surface": pa.array(g[5], pa.string()),
        },
        schema=schemas.GOLD_MENTIONS,
    )
    return docs, gold


def build_gold_pairs(spec: FixtureSpec, concepts: pa.Table, gold: pa.Table) -> pa.Table:
    """Labeled pairs for the pairwise-F1 gate (BASELINE.json metric).

    Positives: mention ↔ its planted concept. Negatives: mention ↔ the
    concept's 1-edit decoy (when one exists) — both sides share a char-3gram
    blocking key, mirroring "labeled pairs within the same blocking key".
    """
    rng = np.random.default_rng(spec.seed + 3)
    by_id = {}
    names = concepts["name"].to_pylist()
    kinds = concepts["kind"].to_pylist()
    ids = concepts["concept_id"].to_pylist()
    for cid, nm, kd in zip(ids, names, kinds):
        if kd == "FSN":
            by_id[cid] = nm
    decoys = {cid - 500_000_000: cid for cid in ids if cid >= 500_000_000 and cid < 900_000_000}

    rows = []
    for doc_id, start, cid, surface in zip(
        gold["doc_id"].to_pylist(),
        gold["start"].to_pylist(),
        gold["concept_id"].to_pylist(),
        gold["surface"].to_pylist(),
    ):
        mid = f"{doc_id}:{start}"
        norm = normalize_text(surface)
        key = norm[:3] if len(norm) >= 3 else norm
        rows.append((key, mid, f"concept:{cid}", True))
        dec = decoys.get(cid)
        if dec is not None:
            rows.append((key, mid, f"concept:{dec}", False))
        elif rng.random() < 0.2 and len(by_id) > 1:
            # random same-key-ish non-match
            other = ids[int(rng.integers(0, len(ids)))]
            if other != cid:
                rows.append((key, mid, f"concept:{other}", False))

    g = list(zip(*rows))
    return pa.table(
        {
            "block_key": pa.array(g[0], pa.string()),
            "left_id": pa.array(g[1], pa.string()),
            "right_id": pa.array(g[2], pa.string()),
            "label": pa.array(g[3], pa.bool_()),
        },
        schema=schemas.GOLD_PAIRS,
    )


def generate(spec: FixtureSpec) -> dict[str, pa.Table]:
    concepts = build_concepts(spec)
    docs, gold = build_docs_and_gold(spec, concepts)
    pairs = build_gold_pairs(spec, concepts, gold)
    return {"docs": docs, "concepts": concepts, "gold_mentions": gold, "gold_pairs": pairs}


def fixture_dir(spec: FixtureSpec, root: str = "/tmp/scel_fixtures") -> str:
    """Generate-once, cache as parquet; atomic rename for cross-process safety."""
    out = os.path.join(root, spec.key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tables = generate(spec)
    tmp = out + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for name, tbl in tables.items():
        if tbl.num_rows >= SHARD_ROWS:
            d = os.path.join(tmp, f"{name}.parquet")
            os.makedirs(d, exist_ok=True)
            per = (tbl.num_rows + N_SHARDS - 1) // N_SHARDS
            for i in range(N_SHARDS):
                shard = tbl.slice(i * per, per)
                if shard.num_rows:
                    pq.write_table(
                        shard,
                        os.path.join(d, f"part-{i:04d}.parquet"),
                        row_group_size=ROW_GROUP_SIZE,
                    )
        else:
            pq.write_table(
                tbl, os.path.join(tmp, f"{name}.parquet"), row_group_size=ROW_GROUP_SIZE
            )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(spec.key)
    try:
        os.rename(tmp, out)
    except OSError:
        # another process won the race; ours is redundant
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out
