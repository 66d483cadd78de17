"""Single-process oracle implementations for the queries whose semantics
are not directly SQL-expressible (sketches, approximate search, the
flagship linkage). The driver's correctness gate compares each Ray
pipeline against ``oracle_sql()`` via DuckDB; for these queries the SQL is
``SELECT … FROM read_parquet('<oracle parquet>')`` over files generated
here by an INDEPENDENT single-process dataflow (plain Python/numpy loops —
no Ray, no Dataset code paths), so the compare exercises the distributed
orchestration end-to-end.

Shared with the engine are only the property-tested scalar kernels whose
bit-exactness is the point (hash_embed, MinHash coefficients, DuckDB
jaro_winkler, simhash64) — reimplementing those would just test float
reproducibility, not the dataflow.

Files land under ``/tmp/scel_oracles/<key>/`` keyed by fixture key +
ORACLE_VERSION; generation is write-once with an atomic rename (same
discipline as fixtures.py).
"""

from __future__ import annotations

import os
import re
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import fixtures

ORACLE_VERSION = 44  # r4ai: + ks_lengths

# mirror of pipelines.entity_link constants (the contract under test)
THETA = 0.995
N_QUERIES = 16
IVF_QUANT = 1_000_000  # centroid quantization grid (order-independent sums)

_HEADER_LINE = re.compile(r"^([A-Z][A-Za-z /]{2,60}):\s*$", re.M)
_TOKEN = re.compile(r"[a-z0-9]+")


# --------------------------------------------------------------------------
# plumbing
# --------------------------------------------------------------------------

def _read(sf_dir: str, table: str) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))


def oracle_dir(sf_dir: str, root: str = "/tmp/scel_oracles") -> str:
    """Generate-once oracle parquet directory for this sf tier."""
    spec = fixtures.spec_for_sf_dir(sf_dir)
    out = os.path.join(root, f"{spec.key}_o{ORACLE_VERSION}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    fdir = fixtures.fixture_dir(spec)
    tmp = out + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    _generate_all(sf_dir, fdir, tmp)
    with open(marker.replace(out, tmp), "w") as f:
        f.write(spec.key)
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _generate_all(sf_dir: str, fdir: str, tmp: str) -> None:
    docs = _load_fixture_docs(fdir)
    mentions = _extract_mentions_oracle(fdir, docs)
    linked = _entity_link_oracle(fdir, mentions)
    writers = {
        "media_inventory": lambda: _media_inventory(docs),
        "frame_samples": lambda: _frame_samples(docs),
        "simhash_buckets": lambda: _simhash_buckets(sf_dir),
        "minhash_lsh_pairs": lambda: _minhash_lsh_pairs(sf_dir),
        "cosine_topk_ivf": lambda: _cosine_topk_ivf(sf_dir),
        "encoder_topk": lambda: _encoder_topk(sf_dir),
        "dict_precision": lambda: _dict_precision(fdir, mentions),
        "entity_link_mentions": lambda: _mentions_table(mentions),
        "entity_link": lambda: linked,
        "entity_link_eval_iou": lambda: _eval_iou(fdir, linked),
        "llm_ner": lambda: _llm_ner(fdir, docs),
        "approx_users": lambda: _approx_users(sf_dir),
        "bm25_topk": lambda: _bm25_topk(sf_dir),
        "winnow_dups": lambda: _winnow_dups(sf_dir),
        "cosine_topk_lsh": lambda: _cosine_topk_lsh(sf_dir),
        "dup_clusters": lambda: _dup_clusters(sf_dir),
        "quality_score": lambda: _quality_score(sf_dir),
        "kmeans_clusters": lambda: _kmeans_clusters(sf_dir),
        "phonetic_pairs": lambda: _phonetic_pairs(sf_dir),
        "mmr_topk": lambda: _mmr_topk(sf_dir),
        "char_entropy": lambda: _char_entropy(sf_dir),
        "em_weights": lambda: _em_weights(sf_dir),
        "lm_perplexity": lambda: _lm_perplexity(sf_dir),
        "pq_codes": lambda: _pq_codes(sf_dir),
        "soft_tfidf_pairs": lambda: _soft_tfidf_pairs(sf_dir),
        "decontaminate_bloom": lambda: _decontaminate_bloom(sf_dir),
        "dedup_keep_best": lambda: _dedup_keep_best(sf_dir),
        "match_pagerank": lambda: _match_pagerank(sf_dir),
        "compression_ratio": lambda: _compression_ratio(sf_dir),
        "bpe_merges": lambda: _bpe_merges(sf_dir),
        "rrf_fusion": lambda: _rrf_fusion(sf_dir),
        "ppjoin_pairs": lambda: _ppjoin_pairs(sf_dir),
        "greedy_assignment": lambda: _greedy_assignment(sf_dir),
        "kcore": lambda: _kcore(sf_dir),
        "pprl_pairs": lambda: _pprl_pairs(sf_dir),
        "stable_matching": lambda: _stable_matching(sf_dir),
        "cosine_range": lambda: _cosine_range(sf_dir),
        "cc_pivot": lambda: _cc_pivot(sf_dir),
        "bpe_tokens": lambda: _bpe_tokens(sf_dir),
        "hard_negatives": lambda: _hard_negatives(sf_dir),
        "kmv_users": lambda: _kmv_users(sf_dir),
        "ivf_pq_topk": lambda: _ivf_pq_topk(sf_dir),
        "bfs_depth": lambda: _bfs_depth(sf_dir),
        "rake_phrases": lambda: _rake_phrases(sf_dir),
        "dim_truncation_recall": lambda: _dim_truncation_recall(sf_dir),
        "kcenter_coreset": lambda: _kcenter_coreset(sf_dir),
        "progressive_er": lambda: _progressive_er(sf_dir),
        "top_component": lambda: _top_component(sf_dir),
        "int8_quant_audit": lambda: _int8_quant_audit(sf_dir),
        "ks_lengths": lambda: _ks_lengths(sf_dir),
        "knn_join": lambda: _knn_join(sf_dir),
    }
    for name, build in writers.items():
        pq.write_table(build() if callable(build) else build,
                       os.path.join(tmp, f"{name}.parquet"))


# --------------------------------------------------------------------------
# fixture-doc helpers (independent re-derivation, no engine code)
# --------------------------------------------------------------------------

def _load_fixture_docs(fdir: str) -> list[dict]:
    """[{doc_id, text, media: [(ref, offset)]}] — text rebuilt by
    concatenating kind=='text' span texts in order."""
    t = pq.read_table(os.path.join(fdir, "docs.parquet"))
    out = []
    for doc_id, spans in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()):
        text_parts = []
        media = []
        for s in spans:
            if s["kind"] == "text":
                text_parts.append(s["text"])
            else:
                media.append((s["media_ref"], s["offset"]))
        out.append({"doc_id": doc_id, "text": "".join(text_parts), "media": media})
    return out


def _sections_of(text: str) -> list[tuple[str, int]]:
    """[(header, start)] covering the doc from 0 (leading text = 'other')."""
    secs = [("other", 0)]
    for m in _HEADER_LINE.finditer(text):
        secs.append((m.group(1), m.start()))
    return secs


def _section_at(secs: list[tuple[str, int]], pos: int) -> str:
    cur = secs[0][0]
    for h, s in secs:
        if s <= pos:
            cur = h
        else:
            break
    return cur


def _norm(s: str) -> str:
    return " ".join(_TOKEN.findall(s.lower()))


# --------------------------------------------------------------------------
# mention extraction + flagship linkage oracle
# --------------------------------------------------------------------------

def _surface_map(fdir: str) -> dict[str, list[int]]:
    c = pq.read_table(os.path.join(fdir, "concepts.parquet"))
    s2c: dict[str, list[int]] = {}
    for name, cid in zip(c["name"].to_pylist(), c["concept_id"].to_pylist()):
        n = _norm(name)
        if not n:
            continue
        s2c.setdefault(n, [])
        if cid not in s2c[n]:
            s2c[n].append(cid)
    return {k: sorted(v) for k, v in s2c.items()}


def _extract_mentions_oracle(fdir: str, docs: list[dict]) -> list[dict]:
    """Word-bounded dictionary scan with trailing-plural absorption (the
    M1/M4/M18 contract): a surface matches exactly the token sequences
    equal to it, or equal plus one trailing 's' on the last token."""
    s2c = _surface_map(fdir)
    surfaces = set(s2c)
    max_k = max(s.count(" ") + 1 for s in surfaces)
    rows = []
    for d in docs:
        text = d["text"]
        low = text.lower()
        secs = _sections_of(text)
        toks = [(m.group(0), m.start(), m.end()) for m in _TOKEN.finditer(low)]
        for i in range(len(toks)):
            joined = ""
            for k in range(1, max_k + 1):
                if i + k > len(toks):
                    break
                joined = toks[i + k - 1][0] if k == 1 else joined + " " + toks[i + k - 1][0]
                start, end = toks[i][1], toks[i + k - 1][2]
                for cand in (joined,) + (
                    (joined[:-1],) if joined.endswith("s") and len(joined) > 1 else ()
                ):
                    if cand in surfaces:
                        rows.append(
                            {
                                "doc_id": d["doc_id"],
                                "start": start,
                                "end": end,
                                "surface": cand,
                                "section": _section_at(secs, start),
                            }
                        )
    rows.sort(key=lambda r: (r["doc_id"], r["start"], r["end"], r["surface"]))
    return rows


def _mentions_table(mentions: list[dict]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([m["doc_id"] for m in mentions], pa.string()),
            "start": pa.array([m["start"] for m in mentions], pa.int32()),
            "end": pa.array([m["end"] for m in mentions], pa.int32()),
            "surface": pa.array([m["surface"] for m in mentions], pa.string()),
            "section": pa.array([m["section"] for m in mentions], pa.string()),
        }
    )


def _entity_link_oracle(fdir: str, mentions: list[dict]) -> pa.Table:
    """Blocking → scoring → star-contracted clustering → majority vote →
    per-doc D2 overlap resolution, as sequential loops."""
    from .functions.overlaps import remove_overlaps
    from .functions.similarity import DuckSimilarity, hash_embed

    s2c = _surface_map(fdir)
    surfaces = sorted(s2c)
    sid_of = {s: i for i, s in enumerate(surfaces)}
    freq = np.zeros(len(surfaces), dtype=np.int64)
    for m in mentions:
        freq[sid_of[m["surface"]]] += 1

    # fuzzy θ-passing links: observed surfaces × dictionary surfaces that
    # share a char-3gram prefix block, hybrid-scored. On the fixtures no
    # non-identical pair may pass θ (1-edit decoys top out ≈0.97); assert
    # it, because the engine's BLOCK_CAP truncation is only output-neutral
    # while that holds.
    by_prefix: dict[str, list[str]] = {}
    for s in surfaces:
        by_prefix.setdefault(s[:3], []).append(s)
    observed = [s for s in surfaces if freq[sid_of[s]] > 0]
    left, right = [], []
    for s in observed:
        for t in by_prefix.get(s[:3], ()):
            if t != s:
                left.append(s)
                right.append(t)
    cand = {s: set(s2c[s]) for s in surfaces}
    if left:
        emb = hash_embed(surfaces)
        jw = DuckSimilarity(threads=1).scores(
            pa.array(left), pa.array(right)
        )["jw"]
        cos = np.einsum(
            "ij,ij->i",
            emb[[sid_of[s] for s in left]],
            emb[[sid_of[t] for t in right]],
        )
        score = 0.5 * jw + 0.5 * cos
        passing = np.nonzero(score >= THETA)[0]
        if len(passing):
            raise AssertionError(
                "fixture has θ-passing non-identical surface pairs; the "
                "oracle must then model BLOCK_CAP truncation: "
                f"{[(left[i], right[i], score[i]) for i in passing[:3]]}"
            )

    # star contraction: concept cliques per corpus-observed surface
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
            parent.setdefault(lo, lo)

    for s in observed:
        cs = sorted(cand[s])
        for c in cs[1:]:
            union(cs[0], c)

    # majority vote per cluster, weighted by surface mention counts
    votes: dict[tuple[int, int], int] = {}
    for s in observed:
        n = int(freq[sid_of[s]])
        for c in cand[s]:
            k = (find(c), c)
            votes[k] = votes.get(k, 0) + n
    modal: dict[int, int] = {}
    best: dict[int, tuple[int, int]] = {}
    for (lab, c), n in sorted(votes.items()):
        if lab not in best or (-n, c) < best[lab]:
            best[lab] = (-n, c)
            modal[lab] = c

    final: dict[str, int] = {}
    for s in observed:
        root = find(min(cand[s]))
        final[s] = modal.get(root, min(cand[s]))

    # attach + per-doc D2 resolution
    by_doc: dict[str, list[dict]] = {}
    for m in mentions:
        by_doc.setdefault(m["doc_id"], []).append(
            {"start": m["start"], "end": m["end"], "concept_id": final[m["surface"]]}
        )
    out_rows = []
    for doc_id in sorted(by_doc):
        spans = {
            (s["start"], s["end"], s["concept_id"]) for s in by_doc[doc_id]
        }
        kept = remove_overlaps(
            [{"start": a, "end": b, "concept_id": c} for a, b, c in sorted(spans)]
        )
        for k in kept:
            out_rows.append((doc_id, k["start"], k["end"], k["concept_id"]))
    out_rows.sort()
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in out_rows], pa.string()),
            "start": pa.array([r[1] for r in out_rows], pa.int32()),
            "end": pa.array([r[2] for r in out_rows], pa.int32()),
            "concept_id": pa.array([r[3] for r in out_rows], pa.int64()),
        }
    )


def _dict_precision(fdir: str, mentions: list[dict], threshold: float = 0.9) -> pa.Table:
    g = pq.read_table(os.path.join(fdir, "gold_mentions.parquet"))
    gold = set(
        zip(g["doc_id"].to_pylist(), g["start"].to_pylist(), g["end"].to_pylist())
    )
    tp: dict[str, int] = {}
    n: dict[str, int] = {}
    for m in mentions:
        s = m["surface"]
        n[s] = n.get(s, 0) + 1
        if (m["doc_id"], m["start"], m["end"]) in gold:
            tp[s] = tp.get(s, 0) + 1
    rows = [
        (s, tp.get(s, 0), n[s])
        for s in sorted(n)
        if tp.get(s, 0) / n[s] >= threshold
    ]
    return pa.table(
        {
            "surface": pa.array([r[0] for r in rows], pa.string()),
            "tp": pa.array([r[1] for r in rows], pa.int64()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _eval_iou(fdir: str, linked: pa.Table) -> pa.Table:
    """Macro metric inputs: per-concept char IoU of linked vs gold
    (1st Place/src/scoring.py:10-47 semantics, interval arithmetic)."""
    g = pq.read_table(
        os.path.join(fdir, "gold_mentions.parquet"),
        columns=["doc_id", "start", "end", "concept_id"],
    )

    def spans_by(side_tbl: pa.Table) -> dict[int, dict[str, list[tuple[int, int]]]]:
        out: dict[int, dict[str, list[tuple[int, int]]]] = {}
        for d, s, e, c in zip(
            side_tbl["doc_id"].to_pylist(), side_tbl["start"].to_pylist(),
            side_tbl["end"].to_pylist(), side_tbl["concept_id"].to_pylist(),
        ):
            out.setdefault(int(c), {}).setdefault(d, []).append((int(s), int(e)))
        return out

    def covered(iv: list[tuple[int, int]]) -> int:
        total, last = 0, -1
        for s, e in sorted(iv):
            if s > last:
                total += e - s
                last = e
            elif e > last:
                total += e - last
                last = e
        return total

    def inter_len(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
        a, b = sorted(a), sorted(b)
        i = j = total = 0
        while i < len(a) and j < len(b):
            s, e = max(a[i][0], b[j][0]), min(a[i][1], b[j][1])
            if s < e:
                total += e - s
            if a[i][1] < b[j][1]:
                i += 1
            else:
                j += 1
        return total

    p, q = spans_by(linked), spans_by(g)
    rows = []
    for c in sorted(set(p) | set(q)):
        inter = union = 0
        docs = set(p.get(c, {})) | set(q.get(c, {}))
        for d in docs:
            a = p.get(c, {}).get(d, [])
            b = q.get(c, {}).get(d, [])
            ii = inter_len(a, b)
            union += covered(a) + covered(b) - ii
            inter += ii
        rows.append((c, inter / union if union else 1.0))
    return pa.table(
        {
            "concept_id": pa.array([r[0] for r in rows], pa.int64()),
            "iou": pa.array([r[1] for r in rows], pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# multimodal / sketch / vector oracles
# --------------------------------------------------------------------------

def _media_meta(ref: str) -> tuple[int, int, int]:
    h = zlib.crc32(ref.encode())
    return (
        64 + h % 1920,
        64 + (h >> 11) % 1080,
        1 + (h >> 22) % 300,
    )


def _media_inventory(docs: list[dict]) -> pa.Table:
    rows = []
    for d in docs:
        for ref, off in d["media"]:
            w, h, nf = _media_meta(ref)
            rows.append((d["doc_id"], ref, off, w, h, nf))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "media_ref": pa.array([r[1] for r in rows], pa.string()),
            "offset": pa.array([r[2] for r in rows], pa.int32()),
            "width": pa.array([r[3] for r in rows], pa.int32()),
            "height": pa.array([r[4] for r in rows], pa.int32()),
            "n_frames": pa.array([r[5] for r in rows], pa.int32()),
        }
    )


def _frame_samples(docs: list[dict], stride: int = 30) -> pa.Table:
    rows = []
    for d in docs:
        for ref, _off in d["media"]:
            _w, _h, nf = _media_meta(ref)
            for i in range(0, nf, stride):
                rows.append((ref, i))
    return pa.table(
        {
            "media_ref": pa.array([r[0] for r in rows], pa.string()),
            "frame_idx": pa.array([r[1] for r in rows], pa.int32()),
        }
    )


def _simhash_buckets(sf_dir: str, prefix_bits: int = 12) -> pa.Table:
    from .functions.hashing import simhash64

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    hs = np.array(
        [simhash64(x.split(" ")) for x in t["text"].to_pylist()], dtype=np.uint64
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "simhash": pa.array(hs.astype(np.int64)),
            "bucket": pa.array(
                (hs >> np.uint64(64 - prefix_bits)).astype(np.int64)
            ),
        }
    )


def _minhash_lsh_pairs(
    sf_dir: str, num_perm: int = 64, bands: int = 16, jaccard_threshold: float = 0.5
) -> pa.Table:
    from .functions.hashing import MinHasher, shingle_hashes

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    mh = MinHasher(num_perm=num_perm)
    ids = t["doc_id"].to_pylist()
    sigs = {
        i: mh.signature(shingle_hashes(x))
        for i, x in zip(ids, t["text"].to_pylist())
    }
    buckets: dict[str, list[int]] = {}
    for i in ids:
        for key in mh.band_keys(sigs[i], bands):
            buckets.setdefault(key, []).append(i)
    pairs: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        members = sorted(members)
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                if (a, b) in pairs:
                    continue
                est = float((sigs[a] == sigs[b]).mean())
                if est >= jaccard_threshold:
                    pairs[(a, b)] = est
    keys = sorted(pairs)
    return pa.table(
        {
            "doc_a": pa.array([k[0] for k in keys], pa.int64()),
            "doc_b": pa.array([k[1] for k in keys], pa.int64()),
            "est_jaccard": pa.array([pairs[k] for k in keys], pa.float64()),
        }
    )


def _encoder_topk(sf_dir: str, k: int = 5) -> pa.Table:
    """Single-process re-derivation of q_encoder_topk: per-doc forward pass
    (token hash_embed -> tanh MLP -> mean-pool -> L2) with the SAME weight
    artifact the actors load (the artifact IS the model under test; what
    this oracle independently re-derives is the distributed dataflow —
    actor-pool encode, broadcast query matrix, partial+final top-k)."""
    from .functions.encoder import MAX_TOKENS, ensure_encoder_artifact
    from .functions.similarity import hash_embed
    from .state.artifacts import load_state

    w = load_state(ensure_encoder_artifact())

    def enc_one(text: str) -> np.ndarray:
        toks = text.split()[:MAX_TOKENS] or [""]
        F = hash_embed(toks, dim=w["W1"].shape[0])
        E = np.tanh(F @ w["W1"] + w["b1"]) @ w["W2"] + w["b2"]
        # identical pooling arithmetic to NumpyEncoder.encode (ADVICE r2):
        # reduceat-sum then divide — same operation order as the pipeline,
        # so oracle and pipeline are bit-identical before quantization
        v = np.add.reduceat(E, np.array([0]), axis=0)[0] / np.float64(E.shape[0])
        return v / max(np.linalg.norm(v), 1e-30)

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    vecs = np.stack([enc_one(x) for x in t["text"].to_pylist()])
    qm = ids < N_QUERIES
    qids, Q = ids[qm], vecs[qm]
    order = np.argsort(qids)
    qids, Q = qids[order], Q[order]
    cids, C = ids[~qm], vecs[~qm]
    sims = np.round(Q @ C.T, 9)
    out_q, out_m, out_r = [], [], []
    for r, qid in enumerate(qids):
        row = sims[r]
        # sort by (-cos, match_id): identical tie-break to the pipeline
        order2 = np.lexsort((cids, -row))[:k]
        out_q.extend([qid] * len(order2))
        out_m.extend(cids[order2])
        out_r.extend(range(1, len(order2) + 1))
    return pa.table(
        {
            "query_id": pa.array(np.asarray(out_q, dtype=np.int64)),
            "match_id": pa.array(np.asarray(out_m, dtype=np.int64)),
            "rank": pa.array(np.asarray(out_r, dtype=np.int64)),
        }
    )


def _cosine_topk_ivf(sf_dir: str, k: int = 5, nprobe: int = 3) -> pa.Table:
    """IVF semantics contract: centroids are per-label means of normalized
    candidate vectors accumulated on a 1e-6 integer grid (order-independent
    sums — the distributed build and this oracle agree bitwise), queries
    probe the nprobe nearest cells, exact cosine within probed cells,
    ties by (cos desc, match_id asc)."""
    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding", "label"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    lab = np.array(t["label"].to_pylist(), dtype=np.int64)
    is_q = vid < N_QUERIES
    Q, qids = E[is_q], vid[is_q]
    order = np.argsort(qids)
    Q, qids = Q[order], qids[order]
    C, cids, clab = E[~is_q], vid[~is_q], lab[~is_q]

    cells = np.unique(clab)
    cent = np.zeros((len(cells), E.shape[1]), dtype=np.float64)
    for ci, c in enumerate(cells):
        m = clab == c
        qsum = np.rint(C[m] * IVF_QUANT).astype(np.int64).sum(axis=0)
        cent[ci] = qsum / (IVF_QUANT * m.sum())
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)

    probe = np.argsort(-(Q @ cent.T), kind="stable", axis=1)[:, :nprobe]
    rows = []
    for qi in range(len(qids)):
        allowed = set(int(cells[c]) for c in probe[qi])
        m = np.isin(clab, list(allowed))
        sims = C[m] @ Q[qi]
        sel = cids[m]
        order = np.lexsort((sel, -sims))[:k]
        for rank, j in enumerate(order, start=1):
            rows.append((int(qids[qi]), int(sel[j]), rank))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "match_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# A5 surrogate-generator pipeline oracle (pipelines/llm.py::q_llm_ner)
# --------------------------------------------------------------------------

def _llm_ner(fdir: str, docs: list[dict], window: int = 100) -> pa.Table:
    """Independent replication of the M22→A5→M23 surrogate pipeline:
    100-token (``\\S+``) windows per doc, dictionary matches found with a
    longest-first alternation regex with word lookarounds (the 2nd-place
    M18 strategy — the engine uses an Aho-Corasick automaton + greedy
    leftmost-longest sweep instead), offsets computed directly in doc
    coordinates (ground truth, independent of the engine's difflib
    realignment path)."""
    c = pq.read_table(os.path.join(fdir, "concepts.parquet"),
                      columns=["concept_id", "name"])
    s2c: dict[str, int] = {}
    for name, cid in zip(c["name"].to_pylist(), c["concept_id"].to_pylist()):
        n = " ".join(_TOKEN.findall(name.lower()))
        if n and (n not in s2c or cid < s2c[n]):
            s2c[n] = cid
    surfs = sorted(s2c, key=len, reverse=True)
    pat = re.compile(
        r"(?<![a-z0-9])(" + "|".join(re.escape(s) for s in surfs) + r")(?![a-z0-9])"
    )
    tok_re = re.compile(r"\S+")
    rows = []
    for d in docs:
        text = d["text"]
        spans = [(m.start(), m.end()) for m in tok_re.finditer(text)]
        for i in range(0, len(spans), window):
            j = min(len(spans), i + window)
            cs, ce = spans[i][0], spans[j - 1][1]
            low = text[cs:ce].lower()
            for m in pat.finditer(low):
                rows.append(
                    (d["doc_id"], cs + m.start(), cs + m.end(),
                     m.group(1), s2c[m.group(1)])
                )
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "start": pa.array([r[1] for r in rows], pa.int32()),
            "end": pa.array([r[2] for r in rows], pa.int32()),
            "surface": pa.array([r[3] for r in rows], pa.string()),
            "concept_id": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _approx_users(sf_dir: str) -> pa.Table:
    """HLL approximate distinct user count — independent single-process
    register build (plain Python loop per value) and an inline
    integer-exact estimator. Shares ONLY the splitmix64 mixer with the
    engine (a fixed public constant scalar kernel; bit-exactness is the
    point — the policy at the top of this file)."""
    import math

    from .functions.sketches import HLL_M, HLL_P, splitmix64

    ids = _read(sf_dir, "events").column("user_id").to_numpy()
    regs = [0] * HLL_M
    for h in splitmix64(np.asarray(ids, dtype=np.int64).astype(np.uint64)):
        h = int(h)
        idx = h >> (64 - HLL_P)
        w = (h << HLL_P) & ((1 << 64) - 1)
        rank = (65 - w.bit_length()) if w else (64 - HLL_P + 1)
        rank = min(rank, 64 - HLL_P + 1)
        if rank > regs[idx]:
            regs[idx] = rank
    s = sum(1 << (64 - r) for r in regs)
    est = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(2**64) / float(s)
    zeros = regs.count(0)
    if est <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * math.log(HLL_M / zeros)
    return pa.table({"approx_users": pa.array([int(round(est))], pa.int64())})


def _bm25_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """BM25 top-k oracle — independent scalar-Python scoring with the same
    float-op ORDER as the engine (the determinism contract documented on
    pipelines/text.py::q_bm25_topk): driver-style idf from exact-integer
    df via math.log, per-doc elementwise IEEE arithmetic, fixed term-order
    accumulation, 1e-9-quantized ranking with doc_id tiebreak."""
    import math

    from .pipelines.text import BM25_B, BM25_K1, BM25_QUERY

    t = _read(sf_dir, "documents")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    toks = [s.split(" ") for s in texts]
    n_docs = len(toks)
    n_tokens = sum(len(x) for x in toks)
    avgdl = float(n_tokens) / n_docs
    idf = {}
    for term in BM25_QUERY:
        df_t = sum(1 for x in toks if term in x)
        idf[term] = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
    rows = []
    for did, x in zip(doc_ids, toks):
        dl = float(len(x))
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
        score = 0.0
        for term in BM25_QUERY:
            tf = float(x.count(term))
            score = score + idf[term] * (tf * (BM25_K1 + 1.0) / (tf + norm))
        rows.append((did, int(np.rint(score * 1e9))))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "score_q": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _winnow_dups(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """Winnowing fingerprint near-dup oracle: plain per-window Horner-loop
    fingerprints (the spec the vectorized kernel is property-tested
    against), python-set Jaccard over all docs sharing any fingerprint.
    Same float policy as the pipeline: one exact-int division per pair."""
    B = 1099511628211
    M = 1 << 64

    def plain_fps(text: str, window: int = 12, mod_bits: int = 4) -> set[int]:
        enc = text.encode("utf-8")
        if not enc:
            return {0}
        w = min(window, len(enc))
        hs = []
        for i in range(len(enc) - w + 1):
            h = 0
            for c in enc[i : i + w]:
                h = (h * B + c) % M
            hs.append(h)
        sel = {h for h in hs if (h & ((1 << mod_bits) - 1)) == 0}
        return sel or {min(hs)}

    t = _read(sf_dir, "documents")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    fps = {d: plain_fps(s) for d, s in zip(doc_ids, texts)}
    by_fp: dict[int, list[int]] = {}
    for d in sorted(fps):
        for h in fps[d]:
            by_fp.setdefault(h, []).append(d)
    cand: set[tuple[int, int]] = set()
    for members in by_fp.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    rows = []
    for a, b in sorted(cand):
        ns = len(fps[a] & fps[b])
        jac = ns / (len(fps[a]) + len(fps[b]) - ns)
        if jac >= threshold:
            rows.append((a, b, ns, jac))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_shared": pa.array([r[2] for r in rows], pa.int64()),
            "fp_jaccard": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def _cosine_range(sf_dir: str) -> pa.Table:
    """Radius (range) similarity-search oracle: plain per-pair integer
    dot products over the SAME 1e6 quantization grid as the pipeline
    (the grid is the scheme, like the LSH bucket codes) — int64 sums in
    a Python loop, no matmul, so agreement with the engine's batched
    matmul proves the integer contract, not float luck."""
    from .pipelines.vectors import (
        N_QUERIES as NQ,
        RANGE_QUANT,
        RANGE_TAU_Q12,
    )

    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    Ei = np.rint(E * RANGE_QUANT).astype(np.int64)
    is_q = vid < NQ
    rows = []
    for qi in np.flatnonzero(is_q):
        for ci in np.flatnonzero(~is_q):
            s = int(sum(int(a) * int(b) for a, b in zip(Ei[qi], Ei[ci])))
            if s >= RANGE_TAU_Q12:
                rows.append((int(vid[qi]), int(vid[ci]), s))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "match_id": pa.array([r[1] for r in rows], pa.int64()),
            "sim_q12": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _cc_pivot(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """Sequential KwikCluster (Ailon-Charikar-Newman) over the fuzzy-name
    match graph in ascending name order — the TEXTBOOK walk: each
    unassigned name becomes a pivot and claims every still-unassigned
    neighbor. The engine computes the same clustering by iterated
    local-minima MIS rounds + a grouped-min assignment pass; the driver
    compare pins the parallel == sequential equivalence. Edge predicate
    identical to the engine's q_fuzzy_name_pairs contract (shared first
    char, length diff <= 3, pinned jaro_winkler >= threshold). Shared
    pinned kernel: jaro_winkler only."""
    from .functions.similarity import jaro_winkler

    t = _read(sf_dir, "part")
    names = sorted(set(t["p_name"].to_pylist()))
    adj: dict = {m: [] for m in names}
    for i, x in enumerate(names):
        for y in names[i + 1:]:
            if x[:1] == y[:1] and abs(len(x) - len(y)) <= 3:
                if jaro_winkler(x, y) >= threshold:
                    adj[x].append(y)
                    adj[y].append(x)
    rep: dict = {}
    for v in names:  # ascending == processing order
        if v in rep:
            continue
        rep[v] = v
        for u in adj[v]:
            if u not in rep:
                rep[u] = v
    return pa.table(
        {
            "p_name": pa.array(names, pa.string()),
            "cluster_rep": pa.array([rep[m] for m in names], pa.string()),
        }
    )


def _knn_join(sf_dir: str, k: int = 3) -> pa.Table:
    """Full kNN self-join oracle: per-pair integer dots on the shared
    1e6 quantization grid, selection by an explicit (sim desc, id asc)
    sort per row — plain loops, no matmul, no argsort tricks."""
    from .pipelines.vectors import RANGE_QUANT

    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    Ei = np.rint(E * RANGE_QUANT).astype(np.int64)
    rows = []
    for i in range(len(vid)):
        sims = []
        for j in range(len(vid)):
            if i == j:
                continue
            s = int(sum(int(a) * int(b) for a, b in zip(Ei[i], Ei[j])))
            sims.append((-s, int(vid[j])))
        sims.sort()
        for r, (_, nn) in enumerate(sims[:k], start=1):
            rows.append((int(vid[i]), nn, r))
    rows.sort()
    return pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "nn_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _bpe_tokens(sf_dir: str, n_merges: int = 12) -> pa.Table:
    """Single-process BPE ENCODE oracle: merge rules from the independent
    full-recount trainer (_bpe_merges), then a plain per-word apply walk
    (repeatedly merge the lowest-rank learned pair, left-to-right within
    a pass) — implemented here independently of the engine's cached
    actor-pool encoder, so agreement pins both the walk and the
    orchestration."""
    mt = _bpe_merges(sf_dir, n_merges=n_merges)
    rank_of = {
        (l, r): int(k)
        for k, l, r in zip(
            mt["rank"].to_pylist(), mt["left"].to_pylist(),
            mt["right"].to_pylist(),
        )
    }

    def encode_len(word: str) -> int:
        syms = list(word)
        while True:
            ranked = [
                (rank_of[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in rank_of
            ]
            if not ranked:
                return len(syms)
            best = min(r for r, _ in ranked)
            la, rb = None, None
            for r, i in ranked:
                if r == best:
                    la, rb = syms[i], syms[i + 1]
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

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    cache: dict = {}
    rows = []
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        words = str(txt).split(" ")
        n_tok = 0
        for w in words:
            if w not in cache:
                cache[w] = encode_len(w)
            n_tok += cache[w]
        rows.append((int(did), len(words), n_tok))
    rows.sort()
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_words": pa.array([r[1] for r in rows], pa.int64()),
            "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _hard_negatives(sf_dir: str, k: int = 3) -> pa.Table:
    """Hard-negative mining oracle: the _knn_join plain-loop shape with a
    different-label filter — per-pair integer dots on the shared 1e6
    quantization grid, selection by explicit (sim desc, id asc) sort."""
    from .pipelines.vectors import RANGE_QUANT

    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding", "label"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    lab = np.array(t["label"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    Ei = np.rint(E * RANGE_QUANT).astype(np.int64)
    rows = []
    for i in range(len(vid)):
        sims = []
        for j in range(len(vid)):
            if i == j or lab[i] == lab[j]:
                continue
            s = int(sum(int(a) * int(b) for a, b in zip(Ei[i], Ei[j])))
            sims.append((-s, int(vid[j])))
        sims.sort()
        for r, (_, nn) in enumerate(sims[:k], start=1):
            rows.append((int(vid[i]), nn, r))
    rows.sort()
    return pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "neg_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _kmv_users(sf_dir: str, k: int = 64) -> pa.Table:
    """KMV bottom-k distinct oracle: plain per-type sets of splitmix64
    hashes (shared pinned kernel, the HLL rationale), k-th smallest by a
    full sort, INTEGER floor estimator (k-1)*2^64 // h_k, exact count
    below k distinct hashes."""
    from .functions.sketches import splitmix64

    t = _read(sf_dir, "events").select(["event_type", "user_id"])
    by_type: dict = {}
    uid = np.array(t["user_id"].to_pylist(), dtype=np.int64)
    hs = splitmix64(uid.view(np.uint64))
    for et, h in zip(t["event_type"].to_pylist(), hs):
        by_type.setdefault(et, set()).add(int(h))
    rows = []
    for et in sorted(by_type):
        s_ = sorted(by_type[et])
        if len(s_) < k:
            est = len(s_)
        else:
            est = (k - 1) * (1 << 64) // s_[k - 1]
        rows.append((et, est))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "est_users": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _cosine_topk_lsh(sf_dir: str, k: int = 5) -> pa.Table:
    """Random-hyperplane LSH top-k oracle: same scheme parameters as the
    pipeline (hyperplane construction + quantization grid are the scheme,
    like MinHash coefficients), independent plain-loop dataflow. Bucket
    codes are exact int64 dot products, so bucket membership is bitwise
    layout-independent by construction; cosine ranking follows the same
    (cos desc, match_id asc) contract as the IVF oracle."""
    from .pipelines.vectors import (
        LSH_BITS,
        LSH_QUANT,
        LSH_SEED,
        LSH_TABLES,
        N_QUERIES as NQ,
    )

    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    is_q = vid < NQ
    Q, qids = E[is_q], vid[is_q]
    order = np.argsort(qids)
    Q, qids = Q[order], qids[order]
    C, cids = E[~is_q], vid[~is_q]

    rs = np.random.RandomState(LSH_SEED)
    H = (rs.randint(0, 2, size=(LSH_TABLES, LSH_BITS, E.shape[1])) * 2 - 1)

    def codes_of(v: np.ndarray) -> list[int]:
        vq = np.rint(v * LSH_QUANT).astype(np.int64)
        out = []
        for tb in range(LSH_TABLES):
            c = 0
            for b in range(LSH_BITS):
                if int(vq @ H[tb, b]) > 0:
                    c |= 1 << b
            out.append(c)
        return out

    qc = [codes_of(Q[i]) for i in range(len(qids))]
    cc = [codes_of(C[i]) for i in range(len(cids))]
    rows = []
    for qi in range(len(qids)):
        m = np.array(
            [any(qc[qi][tb] == cc[ci][tb] for tb in range(LSH_TABLES))
             for ci in range(len(cids))],
            dtype=bool,
        )
        if not m.any():
            continue
        sims = C[m] @ Q[qi]
        sel = cids[m]
        order = np.lexsort((sel, -sims))[: min(k, len(sel))]
        for rank, j in enumerate(order, start=1):
            rows.append((int(qids[qi]), int(sel[j]), rank))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "match_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _dup_clusters(sf_dir: str) -> pa.Table:
    """Duplicate-cluster oracle: plain union-find over the oracle's own
    MinHash+LSH pair table (same edge contract), min-id labels, singletons
    label themselves."""
    pairs = _minhash_lsh_pairs(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
            parent.setdefault(lo, lo)
    t = _read(sf_dir, "documents").select(["doc_id"])
    ids = t["doc_id"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array([int(d) for d in ids], pa.int64()),
            "cluster_id": pa.array([find(int(d)) for d in ids], pa.int64()),
        }
    )


def _quality_score(sf_dir: str) -> pa.Table:
    """Quality-classifier oracle: plain per-doc Python loop over word
    bigrams, Python-int accumulation of the quantized weights (exact; no
    numpy scatter, no batching). Shares only the ``feature_ids`` hash
    kernel with the engine (the documented shared-kernel exception)."""
    from .functions.quality import (
        build_quality_weights,
        ensure_quality_artifact,
        feature_ids,
    )
    from .state.artifacts import load_state

    st = load_state(ensure_quality_artifact())
    assert st is not None, "quality artifact unreadable"
    w_q = [int(x) for x in st["w_q"]]
    b_q = int(st["b_q"])
    # the artifact on disk must be the deterministic build (guards against
    # a stale /tmp artifact from an older seed)
    fresh = build_quality_weights()
    assert [int(x) for x in fresh["w_q"]] == w_q and int(fresh["b_q"]) == b_q

    t = _read(sf_dir, "documents")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out_scores = []
    for text in texts:
        ws = text.split(" ")
        grams = [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
        s = b_q
        if grams:
            for f in feature_ids(grams):
                s += w_q[int(f)]
        out_scores.append(s)
    return pa.table(
        {
            "doc_id": pa.array([int(d) for d in doc_ids], pa.int64()),
            "score_q": pa.array(out_scores, pa.int64()),
            "keep": pa.array([1 if s >= 0 else 0 for s in out_scores], pa.int64()),
        }
    )


def _kmeans_clusters(sf_dir: str, k: int = 8, n_iter: int = 5) -> pa.Table:
    """Single-process integer k-means mirror of
    pipelines.vectors.q_kmeans_clusters: same quantization (round(x*2^15)
    to int64), same int64 distances with argmin-lowest ties, same
    floor_divide centroid update, same init (k lowest vec_ids), same
    n_iter + final labeling pass — computed in one flat numpy pass with
    no Ray, no batching, no partial combines."""
    t = _read(sf_dir, "embeddings")
    df = t.select(["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy(np.int64)
    V = np.round(
        np.stack(df["embedding"].to_numpy()).astype(np.float64) * (1 << 15)
    ).astype(np.int64)

    def assign(C: np.ndarray) -> np.ndarray:
        diff = V[:, None, :] - C[None, :, :]
        return np.argmin(np.einsum("nkd,nkd->nk", diff, diff), axis=1)

    init = np.isin(ids, np.arange(k))
    C = V[init][np.argsort(ids[init])]
    for _ in range(n_iter):
        a = assign(C)
        C = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = np.floor_divide(V[m].sum(axis=0), int(m.sum()))
    a = assign(C)
    return pa.table(
        {
            "vec_id": pa.array(ids.tolist(), pa.int64()),
            "cluster": pa.array(a.astype(np.int64).tolist(), pa.int64()),
        }
    )


def _phonetic_pairs(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.er.q_phonetic_pairs: distinct part
    names grouped by Soundex code (the shared property-pinned kernel —
    tests/test_functions.py pins the classic NARA vectors), all unordered
    same-code pairs in lexicographic order, plain dict-of-lists loops."""
    from .functions.similarity import soundex

    names = sorted(set(_read(sf_dir, "part").column("p_name").to_pylist()))
    by_code: dict = {}
    for n in names:
        by_code.setdefault(soundex(n), []).append(n)
    codes: list = []
    a_out: list = []
    b_out: list = []
    for code in sorted(by_code):
        grp = sorted(by_code[code])
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                codes.append(code)
                a_out.append(grp[i])
                b_out.append(grp[j])
    return pa.table(
        {
            "code": pa.array(codes, pa.string()),
            "name_a": pa.array(a_out, pa.string()),
            "name_b": pa.array(b_out, pa.string()),
        }
    )


def _mmr_topk(
    sf_dir: str,
    k: int = 8,
    pool: int = 32,
    lam_num: int = 7,
    lam_den: int = 10,
) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_mmr_topk: global
    top-pool by quantized relevance (1e-6 int grid, smaller-id ties), then
    the integer-exact greedy MMR sweep — plain per-query Python loops, no
    batching, no partial combines."""
    t = _read(sf_dir, "embeddings")
    df = t.select(["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy(np.int64)
    V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    is_q = ids < N_QUERIES
    qids, Q = ids[is_q], V[is_q]
    cids, C = ids[~is_q], V[~is_q]

    out_q: list = []
    out_m: list = []
    out_r: list = []
    for qi in range(len(qids)):
        rel = np.rint((C @ Q[qi]) * 1e6).astype(np.int64)
        order = sorted(range(len(cids)), key=lambda i: (-rel[i], cids[i]))
        take = order[:pool]
        p_ids = cids[take]
        p_rel = rel[take]
        P = C[take]
        sim = np.rint((P @ P.T) * 1e6).astype(np.int64)
        picked: list[int] = []
        maxsim = [None] * len(take)
        avail = [True] * len(take)
        for step in range(min(k, len(take))):
            best = None
            best_key = None
            for i in range(len(take)):
                if not avail[i]:
                    continue
                if step == 0:
                    s = lam_den * int(p_rel[i])
                else:
                    s = lam_num * int(p_rel[i]) - (lam_den - lam_num) * int(
                        maxsim[i]
                    )
                key = (-s, int(p_ids[i]))
                if best is None or key < best_key:
                    best, best_key = i, key
            picked.append(best)
            avail[best] = False
            for i in range(len(take)):
                s = int(sim[i][best])
                if maxsim[i] is None or s > maxsim[i]:
                    maxsim[i] = s
        for r, i in enumerate(picked, start=1):
            out_q.append(int(qids[qi]))
            out_m.append(int(p_ids[i]))
            out_r.append(r)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "match_id": pa.array(out_m, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
        }
    )


def _char_entropy(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.text.q_char_entropy: per-doc
    character counts via collections.Counter (no composite-key trick),
    the identical int64 nano-nat quantization per (doc, char) term, summed
    per doc — plain loops, no batching."""
    from collections import Counter

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out: list = []
    for txt in texts:
        txt = str(txt)
        n = max(len(txt), 1)
        h = 0
        for _ch, c in Counter(txt).items():
            p = np.float64(c) / np.float64(n)
            h += int(np.rint(-p * np.log(p) * 1e9))
        out.append(h)
    return pa.table(
        {
            "doc_id": pa.array([int(i) for i in ids], pa.int64()),
            "entropy_nnats": pa.array(out, pa.int64()),
        }
    )


def _em_weights(sf_dir: str, n_iter: int = 20) -> pa.Table:
    """Single-process mirror of pipelines.er.q_em_weights: brute-force
    agreement-pattern histogram over (first-char, brand)-blocked part
    pairs (double loop, no chunked bincounts), then scalar-loop EM with
    the same init/iterations; the shared jaro_winkler kernel is
    property-pinned vs DuckDB. Patterns enumerate in (0,0,0)..(1,1,1)
    order on both sides so the float folds see identical operand order."""
    from .functions.similarity import jaro_winkler

    t = _read(sf_dir, "part")
    df = t.select(["p_partkey", "p_name", "p_brand", "p_type", "p_size"]).to_pandas()
    blocks: dict = {}
    for r in df.itertuples(index=False):
        blocks.setdefault((str(r.p_name)[:1], str(r.p_brand)), []).append(
            (str(r.p_name), str(r.p_type), int(r.p_size))
        )
    counts = [0] * 8
    for rows in blocks.values():
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                g1 = 1 if jaro_winkler(a[0], b[0]) >= 0.85 else 0
                g2 = 1 if a[1] == b[1] else 0
                g3 = 1 if abs(a[2] - b[2]) <= 2 else 0
                counts[(g1 << 2) | (g2 << 1) | g3] += 1

    total = float(sum(counts))
    pi = 0.1
    m = [0.9, 0.9, 0.9]
    u = [0.1, 0.1, 0.1]
    pats = [((k >> 2) & 1, (k >> 1) & 1, k & 1) for k in range(8)]
    for _ in range(n_iter):
        wm_sum = 0.0
        wu_sum = 0.0
        m_num = [0.0, 0.0, 0.0]
        u_num = [0.0, 0.0, 0.0]
        for k in range(8):
            pm = 1.0
            pu = 1.0
            for jf in range(3):
                g = pats[k][jf]
                pm *= m[jf] * g + (1.0 - m[jf]) * (1.0 - g)
                pu *= u[jf] * g + (1.0 - u[jf]) * (1.0 - g)
            w = pi * pm / (pi * pm + (1.0 - pi) * pu)
            wm = counts[k] * w
            wu = counts[k] * (1.0 - w)
            wm_sum += wm
            wu_sum += wu
            for jf in range(3):
                m_num[jf] += wm * pats[k][jf]
                u_num[jf] += wu * pats[k][jf]
        pi = wm_sum / total
        m = [x / wm_sum for x in m_num]
        u = [x / wu_sum for x in u_num]

    def q(x: float) -> int:
        return int(np.rint(np.float64(x) * 1e6))

    import math

    return pa.table(
        {
            "field": pa.array(["agree_name", "agree_type", "agree_size"]),
            "m_micro": pa.array([q(x) for x in m], pa.int64()),
            "u_micro": pa.array([q(x) for x in u], pa.int64()),
            "w_agree_micro": pa.array(
                [q(math.log(m[j] / u[j])) for j in range(3)], pa.int64()
            ),
            "w_disagree_micro": pa.array(
                [q(math.log((1.0 - m[j]) / (1.0 - u[j]))) for j in range(3)],
                pa.int64(),
            ),
        }
    )


def _lm_perplexity(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.text.q_lm_perplexity: Counter
    passes for the unigram/bigram model (plain loops, no explode), the
    same add-one smoothing p=(c_bi+1)/(c_uni+V), each term quantized to
    int64 micro-nats before the per-doc sum — log of a ratio of exact
    ints is the same float64 on both sides."""
    from collections import Counter

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    ids = [int(i) for i in t.column("doc_id").to_pylist()]
    texts = [str(x) for x in t.column("text").to_pylist()]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for txt in texts:
        w = txt.split()
        uni.update(w)
        bi.update(a + " " + b for a, b in zip(w, w[1:]))
    V = len(uni)
    nll_out: list = []
    nbi_out: list = []
    for txt in texts:
        w = txt.split()
        total = 0
        for a, b in zip(w, w[1:]):
            p = np.float64(bi[a + " " + b] + 1) / np.float64(uni[a] + V)
            total += int(np.rint(-np.log(p) * 1e6))
        nll_out.append(total)
        nbi_out.append(max(len(w) - 1, 0))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "nll_micro": pa.array(nll_out, pa.int64()),
            "n_bigrams": pa.array(nbi_out, pa.int64()),
        }
    )


def _pq_codes(sf_dir: str, m: int = 4, k: int = 16, n_iter: int = 5) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_pq_codes: per-subspace
    integer k-means (same quantization/distance/tie/update contract as
    _kmeans_clusters) trained on flat numpy arrays, then 4-bit code
    packing — no streaming, no partial folds."""
    t = _read(sf_dir, "embeddings")
    df = t.select(["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy(np.int64)
    V = np.round(
        np.stack(df["embedding"].to_numpy()).astype(np.float64) * (1 << 15)
    ).astype(np.int64)
    d = V.shape[1]
    sub = d // m

    def assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        diff = X[:, None, :] - C[None, :, :]
        return np.argmin(np.einsum("nkd,nkd->nk", diff, diff), axis=1)

    init = np.isin(ids, np.arange(k))
    order = np.argsort(ids[init])
    code = np.zeros(len(ids), dtype=np.int64)
    for j in range(m):
        X = V[:, j * sub : (j + 1) * sub]
        C = X[init][order].copy()
        for _ in range(n_iter):
            a = assign(X, C)
            C = C.copy()
            for c in range(k):
                msk = a == c
                if msk.any():
                    C[c] = np.floor_divide(X[msk].sum(axis=0), int(msk.sum()))
        code |= assign(X, C).astype(np.int64) << (4 * j)
    return pa.table(
        {
            "vec_id": pa.array(ids.tolist(), pa.int64()),
            "pq_code": pa.array(code.tolist(), pa.int64()),
        }
    )


def _soft_tfidf_pairs(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.er.q_soft_tfidf_pairs: df counts
    by plain dict loops over distinct names, the same milli-nat idf and
    micro-JW quantization (shared property-pinned kernel), brute-force
    blocked pairs (same first char, |len diff| <= 3, jw >= 0.8)."""
    from .functions.similarity import jaro_winkler

    names = sorted(set(str(x) for x in _read(sf_dir, "part").column("p_name").to_pylist()))
    n_names = len(names)
    df_of: dict = {}
    for nm in names:
        for t in set(nm.split()):
            df_of[t] = df_of.get(t, 0) + 1
    idf = {
        t: int(np.rint(np.log(np.float64(n_names + 1) / np.float64(c + 1)) * 1e3))
        for t, c in df_of.items()
    }
    a_out: list = []
    b_out: list = []
    s_out: list = []
    for i in range(n_names):
        for j in range(i + 1, n_names):
            a, b = names[i], names[j]
            if a[:1] != b[:1] or abs(len(a) - len(b)) > 3:
                continue
            if jaro_winkler(a, b) < 0.8:
                continue
            total = 0
            tb = sorted(b.split())
            for t in a.split():
                best_jw, best_s = -1, None
                for s in tb:
                    jwm = int(np.rint(jaro_winkler(t, s) * 1e6))
                    if jwm > best_jw:
                        best_jw, best_s = jwm, s
                if best_s is not None and best_jw >= 900_000:
                    total += idf.get(t, 0) * idf.get(best_s, 0) * best_jw
            a_out.append(a)
            b_out.append(b)
            s_out.append(total)
    return pa.table(
        {
            "name_a": pa.array(a_out, pa.string()),
            "name_b": pa.array(b_out, pa.string()),
            "soft_tfidf": pa.array(s_out, pa.int64()),
        }
    )


def _decontaminate_bloom(sf_dir: str, n: int = 3) -> pa.Table:
    """Single-process mirror of pipelines.training.q_decontaminate_bloom:
    plain-loop eval-gram set, one flat Bloom build (16 bits/key, 8
    double-hashed probes; pandas SipHash with the same two keys — a
    public deterministic primitive, shared for the same reason as
    DuckDB's jaro_winkler), per-doc probe counts."""
    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    ids = [int(i) for i in t.column("doc_id").to_pylist()]
    texts = [str(x) for x in t.column("text").to_pylist()]

    def grams_of(txt: str) -> list:
        w = txt.split(" ")
        return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]

    ev = sorted({g for i, txt in zip(ids, texts) if i % 97 == 0
                 for g in grams_of(txt)})
    m_bits = 1 << int(np.ceil(np.log2(max(len(ev) * 16, 64))))
    import pandas as pd_

    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    if ev:
        s = pd_.Series(ev)
        h1 = pd_.util.hash_pandas_object(
            s, index=False, hash_key="0123456789123456").to_numpy()
        h2 = pd_.util.hash_pandas_object(
            s, index=False, hash_key="fedcba9876543210").to_numpy()
        for i in range(8):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    out_id: list = []
    out_n: list = []
    for i, txt in zip(ids, texts):
        if i % 97 == 0:
            continue
        gs = grams_of(txt)
        if not gs:
            continue
        s = pd_.Series(gs)
        h1 = pd_.util.hash_pandas_object(
            s, index=False, hash_key="0123456789123456").to_numpy()
        h2 = pd_.util.hash_pandas_object(
            s, index=False, hash_key="fedcba9876543210").to_numpy()
        hit = np.ones(len(gs), dtype=bool)
        for j in range(8):
            pos = (h1 + np.uint64(j) * h2) % np.uint64(m_bits)
            word = bits[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        c = int(hit.sum())
        if c:
            out_id.append(i)
            out_n.append(c)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "n_contaminated": pa.array(out_n, pa.int64()),
        }
    )


def _dedup_keep_best(sf_dir: str, prefix_bits: int = 12) -> pa.Table:
    """Single-process mirror of pipelines.dedup.q_dedup_keep_best:
    per-doc simhash64 (shared property-pinned kernel), dict-of-lists
    buckets, plain max-by-(n_chars, -doc_id) keeper per bucket of ≥2."""
    from .functions.hashing import simhash64

    t = _read(sf_dir, "documents").select(["doc_id", "text", "n_chars"])
    ids = [int(i) for i in t.column("doc_id").to_pylist()]
    nch = [int(i) for i in t.column("n_chars").to_pylist()]
    buckets: dict = {}
    for i, txt in enumerate(t.column("text").to_pylist()):
        h = simhash64(str(txt).split(" "))
        b = int(np.uint64(h) >> np.uint64(64 - prefix_bits))
        buckets.setdefault(b, []).append(i)
    out_b: list = []
    out_k: list = []
    out_n: list = []
    for b in sorted(buckets):
        rows = buckets[b]
        if len(rows) < 2:
            continue
        best = min(rows, key=lambda i: (-nch[i], ids[i]))
        out_b.append(b)
        out_k.append(ids[best])
        out_n.append(len(rows))
    return pa.table(
        {
            "bucket": pa.array(out_b, pa.int64()),
            "keeper_doc_id": pa.array(out_k, pa.int64()),
            "n_dups": pa.array(out_n, pa.int64()),
        }
    )


def _match_pagerank(sf_dir: str, n_iter: int = 10) -> pa.Table:
    """Single-process mirror of pipelines.er.q_match_pagerank: brute-force
    blocked fuzzy edges (shared property-pinned jaro_winkler), adjacency
    dict, the same integer power-iteration contract in scalar loops."""
    from .functions.similarity import jaro_winkler

    names = sorted(
        set(str(x) for x in _read(sf_dir, "part").column("p_name").to_pylist())
    )
    n = len(names)
    adj: dict = {i: [] for i in range(n)}
    for i in range(n):
        for j in range(i + 1, n):
            a, b = names[i], names[j]
            if a[:1] != b[:1] or abs(len(a) - len(b)) > 3:
                continue
            if jaro_winkler(a, b) < 0.8:
                continue
            adj[i].append(j)
            adj[j].append(i)
    S = 10**12
    base = (15 * S) // (100 * n)
    r = [S // n] * n
    for _ in range(n_iter):
        sums = [0] * n
        for u in range(n):
            d = max(len(adj[u]), 1)
            c = r[u] // d
            for v in adj[u]:
                sums[v] += c
        r = [base + (85 * s) // 100 for s in sums]
    return pa.table(
        {
            "p_name": pa.array(names, pa.string()),
            "pagerank_pico": pa.array(r, pa.int64()),
        }
    )


def _compression_ratio(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.text.q_compression_ratio: the
    same public zlib codec at level 6, plain loop."""
    import zlib

    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    ids = [int(i) for i in t.column("doc_id").to_pylist()]
    raw = [str(x).encode("utf-8") for x in t.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "raw_bytes": pa.array([len(b) for b in raw], pa.int64()),
            "deflate_bytes": pa.array(
                [len(zlib.compress(b, 6)) for b in raw], pa.int64()
            ),
        }
    )


def _bpe_merges(sf_dir: str, n_merges: int = 12) -> pa.Table:
    """Single-process mirror of pipelines.training.q_bpe_merges: Sennrich
    (2016) reference shape — word-frequency dict, FULL pair recount every
    iteration (the distributed side recounts incrementally; agreeing
    outputs pin the incremental bookkeeping), ties (count desc, pair asc)."""
    from collections import Counter

    t = _read(sf_dir, "documents").select(["text"])
    wc: Counter = Counter()
    for txt in t.column("text").to_pylist():
        wc.update(str(txt).split(" "))
    words = {w: tuple(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = wc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (la, rb), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, la, rb, int(cnt)))
        for w, syms in list(words.items()):
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == la and syms[j + 1] == rb:
                    out.append(la + rb)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = tuple(out)
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def _rrf_fusion(sf_dir: str, k: int = 10, pool: int = 100, c: int = 60) -> pa.Table:
    """Single-process mirror of pipelines.text.q_rrf_fusion: rank lists from
    this module's own _bm25_topk / _quality_score (independent of the Ray
    implementations), scalar-Python fusion with the BM25 term first."""
    a = _bm25_topk(sf_dir, k=pool)
    rank_a = {int(d): i + 1 for i, d in enumerate(a.column("doc_id").to_pylist())}
    q = _quality_score(sf_dir)
    qrows = sorted(
        zip(q.column("score_q").to_pylist(), q.column("doc_id").to_pylist()),
        key=lambda t: (-t[0], t[1]),
    )[:pool]
    rank_b = {int(d): i + 1 for i, (_, d) in enumerate(qrows)}
    cand = sorted(set(rank_a) | set(rank_b))
    recs = []
    for d in cand:
        ra, rb = rank_a.get(d, 0), rank_b.get(d, 0)
        fused = (1.0 / (c + ra) if ra > 0 else 0.0) + (
            1.0 / (c + rb) if rb > 0 else 0.0
        )
        recs.append((d, ra, rb, fused))
    recs.sort(key=lambda t: (-t[3], t[0]))
    recs = recs[:k]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in recs], pa.int64()),
            "rank_bm25": pa.array([r[1] for r in recs], pa.int64()),
            "rank_quality": pa.array([r[2] for r in recs], pa.int64()),
            "rrf": pa.array([r[3] for r in recs], pa.float64()),
        }
    )


def _ppjoin_pairs(sf_dir: str, t_num: int = 1, t_den: int = 2) -> pa.Table:
    """Single-process mirror of pipelines.dedup.q_ppjoin_pairs: exact
    all-pairs char-5-shingle Jaccard with the integer threshold
    t_den*ov >= t_num*union (only the property-tested shingle kernel is
    shared, per this module's header)."""
    from .functions import hashing

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = [int(x) for x in t.column("doc_id").to_pylist()]
    sets = [set(hashing.shingle_hashes(x).tolist()) for x in t.column("text").to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    rows = []
    for ii in range(len(order)):
        i = order[ii]
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            ov = len(sets[i] & sets[j])
            if ov == 0:
                continue
            union = len(sets[i]) + len(sets[j]) - ov
            if t_den * ov >= t_num * union:
                rows.append((ids[i], ids[j], ov, float(np.float64(ov) / np.float64(union))))
    return pa.table(
        {
            "doc_id_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id_b": pa.array([r[1] for r in rows], pa.int64()),
            "overlap": pa.array([r[2] for r in rows], pa.int64()),
            "jaccard": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def _greedy_assignment(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """Sequential greedy one-to-one assignment — the TEXTBOOK algorithm
    (walk all candidate pairs in descending (jw, name_a, name_b) order,
    take a pair iff both endpoints are free). The engine computes the
    same matching by iterated locally-dominant rounds (Preis '99); the
    driver compare pins the equivalence. Shared pinned kernel:
    jaro_winkler only."""
    from .functions.similarity import jaro_winkler

    t = _read(sf_dir, "part")
    pk = t["p_partkey"].to_numpy()
    nm = t["p_name"].to_pylist()
    a_names = sorted({n for k, n in zip(pk, nm) if k % 2 == 0})
    b_names = sorted({n for k, n in zip(pk, nm) if k % 2 == 1})
    pairs = []
    for x in a_names:
        for y in b_names:
            if x[:1] == y[:1] and abs(len(x) - len(y)) <= 3:
                s = jaro_winkler(x, y)
                if s >= threshold:
                    pairs.append((int(np.floor(s * 1_000_000)), x, y))
    pairs.sort(key=lambda p: (-p[0], p[1], p[2]))
    used_a: set = set()
    used_b: set = set()
    rows = []
    for s, x, y in pairs:
        if x not in used_a and y not in used_b:
            used_a.add(x)
            used_b.add(y)
            rows.append((x, y, s))
    rows.sort()
    return pa.table(
        {
            "name_a": pa.array([r[0] for r in rows], pa.string()),
            "name_b": pa.array([r[1] for r in rows], pa.string()),
            "jw_ubin": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _kcore(sf_dir: str, k: int = 2, threshold: float = 0.8) -> pa.Table:
    """Single-process k-core peeling over the fuzzy-name match edges
    (same blocked predicate as the engine: shared first char, length
    diff <= 3, pinned jaro_winkler >= threshold on distinct part names).
    Plain dict/set peeling loop — no Ray, no Dataset code."""
    from .functions.similarity import jaro_winkler

    t = _read(sf_dir, "part")
    names = sorted(set(t["p_name"].to_pylist()))
    adj: dict[str, set] = {}
    for i, x in enumerate(names):
        for y in names[i + 1:]:
            if x[:1] == y[:1] and abs(len(x) - len(y)) <= 3:
                if jaro_winkler(x, y) >= threshold:
                    adj.setdefault(x, set()).add(y)
                    adj.setdefault(y, set()).add(x)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    rows = sorted((n, len(v)) for n, v in adj.items())
    return pa.table(
        {
            "p_name": pa.array([r[0] for r in rows], pa.string()),
            "degree": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _pprl_pairs(sf_dir: str, threshold_micro: int = 700_000) -> pa.Table:
    """Single-process PPRL pair generation: full quadratic over distinct
    part names, candidate iff the two 64-bit Bloom encodings agree on at
    least one NONZERO 16-bit band (the engine's documented blocking
    predicate), linked iff integer-exact Dice >= threshold. Shared pinned
    kernel: bloom_encode64 only."""
    from .functions.hashing import bloom_encode64

    t = _read(sf_dir, "part")
    names = sorted(set(t["p_name"].to_pylist()))
    codes = [bloom_encode64(n) for n in names]
    pops = [bin(c).count("1") for c in codes]
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            ci, cj = codes[i], codes[j]
            shared_band = any(
                ((ci >> (16 * b)) & 0xFFFF) != 0
                and ((ci >> (16 * b)) & 0xFFFF) == ((cj >> (16 * b)) & 0xFFFF)
                for b in range(4)
            )
            if not shared_band:
                continue
            dice = 2_000_000 * bin(ci & cj).count("1") // (pops[i] + pops[j])
            if dice >= threshold_micro:
                rows.append((names[i], names[j], dice))
    rows.sort()
    return pa.table(
        {
            "name_a": pa.array([r[0] for r in rows], pa.string()),
            "name_b": pa.array([r[1] for r in rows], pa.string()),
            "dice_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _stable_matching(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """Sequential Gale-Shapley deferred acceptance (McVitie-Wilson free
    stack, A-proposing) over the same blocked two-source candidate graph
    as _greedy_assignment. With strict preferences the A-optimal outcome
    is unique, so the engine's batched distributed rounds must agree
    bit-for-bit. Shared pinned kernel: jaro_winkler only."""
    from .functions.similarity import jaro_winkler

    t = _read(sf_dir, "part")
    pk = t["p_partkey"].to_numpy()
    nm = t["p_name"].to_pylist()
    a_names = sorted({n for k, n in zip(pk, nm) if k % 2 == 0})
    b_names = sorted({n for k, n in zip(pk, nm) if k % 2 == 1})
    prefs: dict[str, list] = {}
    score: dict[tuple, int] = {}
    for x in a_names:
        cands = []
        for y in b_names:
            if x[:1] == y[:1] and abs(len(x) - len(y)) <= 3:
                s = jaro_winkler(x, y)
                if s >= threshold:
                    q = int(np.floor(s * 1_000_000))
                    cands.append((-q, y))
                    score[(x, y)] = q
        cands.sort()
        prefs[x] = [y for _, y in cands]
    ptr = {x: 0 for x in a_names}
    engaged: dict[str, str] = {}  # b -> a
    free = [x for x in a_names if prefs.get(x)]
    while free:
        x = free.pop()
        if ptr[x] >= len(prefs[x]):
            continue
        y = prefs[x][ptr[x]]
        ptr[x] += 1
        cur = engaged.get(y)
        if cur is None:
            engaged[y] = x
        else:
            # b prefers higher score, ties -> lexicographically smaller a
            new_k = (-score[(x, y)], x)
            cur_k = (-score[(cur, y)], cur)
            if new_k < cur_k:
                engaged[y] = x
                free.append(cur)
            else:
                free.append(x)
    rows = sorted((a, b, score[(a, b)]) for b, a in engaged.items())
    return pa.table(
        {
            "name_a": pa.array([r[0] for r in rows], pa.string()),
            "name_b": pa.array([r[1] for r in rows], pa.string()),
            "jw_ubin": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _ivf_pq_topk(sf_dir: str, k: int = 5, nprobe: int = 3,
                 m: int = 4, kc: int = 16, n_iter: int = 5) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_ivf_pq_topk: the
    _cosine_topk_ivf centroid/probe contract (1e-6-grid normalized means,
    stable argsort probe) composed with the _pq_codes codebook contract
    (2^15-grid integer k-means, lowest-id ties, floor_divide update) and
    exact int64 ADC — flat numpy arrays, no streaming."""
    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding", "label"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lab = np.array(t["label"].to_pylist(), dtype=np.int64)

    # --- IVF probe (mirrors _cosine_topk_ivf) ---
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
    is_q = vid < N_QUERIES
    Q, qids = En[is_q], vid[is_q]
    order = np.argsort(qids)
    Q, qids = Q[order], qids[order]
    Cn, cids, clab = En[~is_q], vid[~is_q], lab[~is_q]
    cells = np.unique(clab)
    cent = np.zeros((len(cells), E.shape[1]), dtype=np.float64)
    for ci, c in enumerate(cells):
        msk = clab == c
        qsum = np.rint(Cn[msk] * IVF_QUANT).astype(np.int64).sum(axis=0)
        cent[ci] = qsum / (IVF_QUANT * msk.sum())
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    probe = np.argsort(-(Q @ cent.T), kind="stable", axis=1)[:, :nprobe]

    # --- PQ codebooks (mirrors _pq_codes: trained on ALL rows) ---
    o_all = np.argsort(vid)
    V = np.round(E[o_all] * (1 << 15)).astype(np.int64)
    ids_all = vid[o_all]
    d = V.shape[1]
    sub = d // m

    def assign(X: np.ndarray, C_: np.ndarray) -> np.ndarray:
        diff = X[:, None, :] - C_[None, :, :]
        return np.argmin(np.einsum("nkd,nkd->nk", diff, diff), axis=1)

    init = np.isin(ids_all, np.arange(kc))
    iord = np.argsort(ids_all[init])
    books = []
    for j in range(m):
        X = V[:, j * sub : (j + 1) * sub]
        C_ = X[init][iord].copy()
        for _ in range(n_iter):
            a = assign(X, C_)
            C_ = C_.copy()
            for c in range(kc):
                msk = a == c
                if msk.any():
                    C_[c] = np.floor_divide(X[msk].sum(axis=0), int(msk.sum()))
        books.append(C_)

    # --- candidate codes + exact int64 ADC ---
    cand_mask = ids_all >= N_QUERIES
    Vc, idc = V[cand_mask], ids_all[cand_mask]
    labc = lab[o_all][cand_mask]
    codes = np.stack(
        [assign(Vc[:, j * sub : (j + 1) * sub], books[j]) for j in range(m)],
        axis=1,
    )  # [nc, m]
    Vq = V[~cand_mask]
    rows_out = []
    for qi in range(len(qids)):
        allowed = set(int(cells[c]) for c in probe[qi])
        msk = np.isin(labc, list(allowed))
        T = np.empty((m, kc), dtype=np.int64)
        for j in range(m):
            diff = Vq[qi, None, j * sub : (j + 1) * sub] - books[j]
            T[j] = np.einsum("kd,kd->k", diff, diff)
        dist = np.zeros(int(msk.sum()), dtype=np.int64)
        cj = codes[msk]
        for j in range(m):
            dist += T[j][cj[:, j]]
        sel = idc[msk]
        order2 = np.lexsort((sel, dist))[:k]
        for rank, jj in enumerate(order2, start=1):
            rows_out.append((int(qids[qi]), int(sel[jj]), rank, int(dist[jj])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows_out], pa.int64()),
            "match_id": pa.array([r[1] for r in rows_out], pa.int64()),
            "rank": pa.array([r[2] for r in rows_out], pa.int64()),
            "adc_dist": pa.array([r[3] for r in rows_out], pa.int64()),
        }
    )


def _bfs_depth(sf_dir: str, threshold: float = 0.8,
               max_len_diff: int = 3) -> pa.Table:
    """Single-process mirror of pipelines.er.q_bfs_depth: brute-force the
    uncapped fuzzy predicate (same first char, |len diff| <= 3, shared
    property-pinned JW kernel >= threshold), then a plain-queue BFS from
    each component's lexicographically smallest member."""
    from collections import deque

    from .functions.similarity import jaro_winkler

    names = sorted(set(
        str(x) for x in _read(sf_dir, "part").column("p_name").to_pylist()
    ))
    n = len(names)
    adj: list[list[int]] = [[] for _ in range(n)]
    for i in range(n):
        a = names[i]
        for j in range(i + 1, n):
            b = names[j]
            if a[:1] != b[:1] or abs(len(a) - len(b)) > max_len_diff:
                continue
            if jaro_winkler(a, b) >= threshold:
                adj[i].append(j)
                adj[j].append(i)
    depth = [-1] * n
    root = [-1] * n
    for i in range(n):  # ascending id = lexicographic root-first order
        if depth[i] >= 0:
            continue
        depth[i], root[i] = 0, i
        q = deque([i])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if depth[v] < 0:
                    depth[v], root[v] = depth[u] + 1, i
                    q.append(v)
    return pa.table(
        {
            "p_name": pa.array(names, pa.string()),
            "root": pa.array([names[r] for r in root], pa.string()),
            "depth": pa.array(depth, pa.int64()),
        }
    )


def _rake_phrases(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.text.q_rake_phrases: plain
    loops over each doc's tokens — stopword-delimited phrase runs, RAKE
    deg/freq word scores in floor micro-units, top phrase per doc with
    (score desc, phrase asc) ties."""
    stop = {"the", "a", "fast", "slow"}
    t = _read(sf_dir, "documents").select(["doc_id", "text"])
    out_d: list = []
    out_p: list = []
    out_s: list = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        phrases: list[list[str]] = []
        cur: list[str] = []
        for w in str(text).split():
            if w in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        if not phrases:
            continue
        freq: dict = {}
        deg: dict = {}
        for ph in phrases:
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
        best = None
        for ph in phrases:
            s = sum((deg[w] * 1_000_000) // freq[w] for w in ph)
            key = (-s, " ".join(ph))
            if best is None or key < best:
                best = key
        out_d.append(int(doc_id))
        out_p.append(best[1])
        out_s.append(-best[0])
    return pa.table(
        {
            "doc_id": pa.array(out_d, pa.int64()),
            "phrase": pa.array(out_p, pa.string()),
            "score_micro": pa.array(out_s, pa.int64()),
        }
    )


def _dim_truncation_recall(sf_dir: str, k: int = 5, dims: int = 16) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_dim_truncation_recall
    with the ENGINE's float contract (float64 normalize + matmul,
    (-cos, id) lexsort ties) — sequential rather than SQL so no
    cross-engine float32/float64 rounding ever sits at the rank-k
    boundary of the two top-k sets being differenced."""
    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vid)
    vid, E = vid[order], E[order]
    isq = vid < N_QUERIES

    def topk_sets(M: np.ndarray) -> list:
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        Q, C = Mn[isq], Mn[~isq]
        cids = vid[~isq]
        sims = Q @ C.T
        out = []
        for r in range(len(Q)):
            sel = np.lexsort((cids, -sims[r]))[:k]
            out.append(set(int(cids[j]) for j in sel))
        return out

    full = topk_sets(E)
    trunc = topk_sets(E[:, :dims])
    qids = vid[isq]
    return pa.table(
        {
            "query_id": pa.array(qids.tolist(), pa.int64()),
            "n_common": pa.array(
                [len(f & s) for f, s in zip(full, trunc)], pa.int64()
            ),
        }
    )


def _kcenter_coreset(sf_dir: str, k: int = 8) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_kcenter_coreset:
    Gonzalez farthest-point traversal on the 2^15 integer grid — flat
    numpy, seed = lowest vec_id, argmax of min-distance with
    (dist desc, id asc) ties, chosen ids never re-picked."""
    t = _read(sf_dir, "embeddings").select(["vec_id", "embedding"])
    vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(vid)
    vid = vid[order]
    V = np.round(
        np.array(t["embedding"].to_pylist(), dtype=np.float64)[order] * (1 << 15)
    ).astype(np.int64)
    chosen = [0]                       # index of lowest vec_id (sorted order)
    dists = [0]
    md = np.full(len(vid), np.iinfo(np.int64).max, dtype=np.int64)
    for _ in range(k - 1):
        diff = V - V[chosen[-1]]
        md = np.minimum(md, np.einsum("nd,nd->n", diff, diff))
        live = np.ones(len(vid), dtype=bool)
        live[chosen] = False
        ids_l = vid[live]
        md_l = md[live]
        j = np.lexsort((ids_l, -md_l))[0]
        pick_id = int(ids_l[j])
        chosen.append(int(np.searchsorted(vid, pick_id)))
        dists.append(int(md_l[j]))
    return pa.table(
        {
            "vec_id": pa.array([int(vid[c]) for c in chosen], pa.int64()),
            "pick_order": pa.array(list(range(len(chosen))), pa.int64()),
            "min_dist": pa.array(dists, pa.int64()),
        }
    )


def _progressive_er(sf_dir: str, threshold: float = 0.8,
                    step: int = 8, max_len_diff: int = 3) -> pa.Table:
    """Single-process mirror of pipelines.er.q_progressive_er:
    brute-force the uncapped fuzzy predicate with the shared JW kernel,
    replay pairs best-first (floor-micro score desc, name pair asc)
    through a sequential union-find, emit the curve every ``step`` pairs
    plus the final partial step."""
    from .functions.similarity import jaro_winkler

    names = sorted(set(
        str(x) for x in _read(sf_dir, "part").column("p_name").to_pylist()
    ))
    n = len(names)
    edges = []
    for i in range(n):
        a = names[i]
        for j in range(i + 1, n):
            b = names[j]
            if a[:1] != b[:1] or abs(len(a) - len(b)) > max_len_diff:
                continue
            jw = jaro_winkler(a, b)
            if jw >= threshold:
                edges.append((int(np.floor(jw * 1_000_000)), a, b, i, j))
    edges.sort(key=lambda e: (-e[0], e[1], e[2]))
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = []
    merges = 0
    for k, (_, _, _, i, j) in enumerate(edges, start=1):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
            merges += 1
        if k % step == 0 or k == len(edges):
            rows.append((k, merges, n - merges))
    return pa.table(
        {
            "budget": pa.array([r[0] for r in rows], pa.int64()),
            "n_merges": pa.array([r[1] for r in rows], pa.int64()),
            "n_clusters": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _top_component(sf_dir: str, n_iter: int = 200) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_top_component: same
    exact-int64 moment matrix (order-independent sums), same fixed-step
    float64 power iteration from e0, same sign convention."""
    t = _read(sf_dir, "embeddings").select(["embedding"])
    V = np.round(
        np.array(t["embedding"].to_pylist(), dtype=np.float64) * (1 << 15)
    ).astype(np.int64)
    n = len(V)
    sv = V.sum(axis=0)
    svv = (V.T @ V)
    d = len(sv)
    # Python-int combine, matching the pipeline's overflow-proof contract
    C = (
        n * svv.astype(object) - np.outer(sv.astype(object), sv.astype(object))
    ).astype(np.float64)
    v = np.zeros(d, dtype=np.float64)
    v[0] = 1.0
    for _ in range(n_iter):
        w = C @ v
        nw = np.linalg.norm(w)
        if nw == 0.0:
            break
        v = w / nw
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return pa.table(
        {
            "dim": pa.array(list(range(d)), pa.int64()),
            "loading_micro": pa.array(
                np.rint(v * 1_000_000).astype(np.int64).tolist(), pa.int64()
            ),
        }
    )


def _int8_quant_audit(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.vectors.q_int8_quant_audit:
    same grid, same floor-division quantize/reconstruct, flat numpy."""
    t = _read(sf_dir, "embeddings").select(["embedding"])
    V = np.round(
        np.array(t["embedding"].to_pylist(), dtype=np.float64) * (1 << 15)
    ).astype(np.int64)
    lo = V.min(axis=0)
    hi = V.max(axis=0)
    rng = np.maximum(hi - lo, 1)
    q = ((V - lo) * 255) // rng
    recon = lo + (q * rng) // 255
    err = V - recon
    sse = np.einsum("nd,nd->d", err, err)
    d = V.shape[1]
    return pa.table(
        {
            "dim": pa.array(list(range(d)), pa.int64()),
            "lo_q": pa.array(lo.tolist(), pa.int64()),
            "hi_q": pa.array(hi.tolist(), pa.int64()),
            "sse": pa.array(sse.tolist(), pa.int64()),
        }
    )


def _ks_lengths(sf_dir: str) -> pa.Table:
    """Single-process mirror of pipelines.text.q_ks_lengths: plain dict
    histograms per source, CDF walk over the union of observed lengths,
    integer cross-multiplied max gap."""
    t = _read(sf_dir, "documents").select(["source", "n_chars"])
    hist: dict = {}
    for s, L in zip(t["source"].to_pylist(), t["n_chars"].to_pylist()):
        hist.setdefault(s, {})
        hist[s][int(L)] = hist[s].get(int(L), 0) + 1
    srcs = sorted(hist)
    lengths = sorted(set(k for h in hist.values() for k in h))
    a_o, b_o, k_o, d_o = [], [], [], []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            na = sum(hist[sa].values())
            nb = sum(hist[sb].values())
            ca = cb = 0
            best = 0
            for L in lengths:
                ca += hist[sa].get(L, 0)
                cb += hist[sb].get(L, 0)
                best = max(best, abs(ca * nb - cb * na))
            a_o.append(sa)
            b_o.append(sb)
            k_o.append(best)
            d_o.append(na * nb)
    return pa.table(
        {
            "source_a": pa.array(a_o, pa.string()),
            "source_b": pa.array(b_o, pa.string()),
            "ks_num": pa.array(k_o, pa.int64()),
            "denom": pa.array(d_o, pa.int64()),
        }
    )
