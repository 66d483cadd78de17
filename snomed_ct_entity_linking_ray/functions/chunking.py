"""Document chunking with char-offset tracking (SURVEY.md M14/M20/M21).

Token-window chunking reproduces the semantics the reference needs for
model windows: 512-token blocks with offset mapping (2nd Place/submission/
infer.py:27-41) and section-bounded chunks with char indices + greedy
merging (3rd Place/src/document.py:281-378, 396-438). The "tokenizer" here
is the whitespace/word-regex token stream (no HF models in this container);
the chunk/merge logic is tokenizer-agnostic.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"\S+")


def token_spans(text: str) -> list[tuple[int, int]]:
    return [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def chunk_by_tokens(
    text: str, max_tokens: int, overlap: int = 0
) -> list[tuple[int, int]]:
    """Split into windows of ≤ max_tokens tokens; returns char [start, end)
    per chunk; consecutive chunks overlap by ``overlap`` tokens (M14)."""
    spans = token_spans(text)
    if not spans:
        return []
    step = max(1, max_tokens - overlap)
    out = []
    i = 0
    while i < len(spans):
        j = min(len(spans), i + max_tokens)
        out.append((spans[i][0], spans[j - 1][1]))
        if j == len(spans):
            break
        i += step
    return out


def chunk_sections(
    text: str,
    sections: list[tuple[str, int, int]],
    max_tokens: int,
) -> list[tuple[int, int, str]]:
    """M20: per-section chunks (section boundaries never crossed), long
    sections split at sentence-ish boundaries ('.' or newline) while
    respecting max_tokens; returns (start, end, header)."""
    out = []
    for header, s, e in sections:
        seg = text[s:e]
        spans = token_spans(seg)
        if not spans:
            continue
        if len(spans) <= max_tokens:
            out.append((s + spans[0][0], s + spans[-1][1], header))
            continue
        # split at phrase boundaries, greedy fill up to max_tokens
        cur_start = spans[0][0]
        count = 0
        last_end = spans[0][1]
        for a, b in spans:
            count += 1
            last_end = b
            boundary = seg[b - 1] in ".\n" if b > 0 else False
            if count >= max_tokens or (boundary and count >= max_tokens // 2):
                out.append((s + cur_start, s + last_end, header))
                cur_start = None
                count = 0
            elif cur_start is None:
                cur_start = a
                count = 1
        if cur_start is not None and count > 0:
            out.append((s + cur_start, s + last_end, header))
    return out


def merge_chunks(
    chunks: list[tuple[int, int, str]], max_tokens: int, text: str
) -> list[tuple[int, int, str]]:
    """M21: greedy-merge consecutive chunks while the merged token count
    stays ≤ max_tokens; keeps first-start/last-end indices; headers join
    with '|'. Order-sensitive — chunks must be in document order."""
    if not chunks:
        return []
    out = []
    cur_s, cur_e, cur_h = chunks[0]
    for s, e, h in chunks[1:]:
        merged_tokens = len(token_spans(text[cur_s:e]))
        if merged_tokens <= max_tokens:
            cur_e = e
            if h != cur_h.split("|")[-1]:
                cur_h = f"{cur_h}|{h}"
        else:
            out.append((cur_s, cur_e, cur_h))
            cur_s, cur_e, cur_h = s, e, h
    out.append((cur_s, cur_e, cur_h))
    return out
