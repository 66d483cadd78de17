"""Char-offset arithmetic after text cuts (SURVEY.md §2.8).

``remap_spans_after_cut`` reproduces the offset-shift semantics of
2nd Place/src/cut_headers.py:53-84 (spans shift left when earlier sections
are removed; spans inside a removed interval are dropped).
``fix_trailing_space`` reproduces 2nd Place/src/data.py:60-86 (shrink spans
whose edges sit on whitespace).
"""

from __future__ import annotations

from bisect import bisect_right


def remap_spans_after_cut(
    cuts: list[tuple[int, int]], spans: list[tuple[int, int]]
) -> list[tuple[int, int] | None]:
    """cuts: sorted disjoint removed half-open intervals. Returns, per input
    span, its (start, end) in the cut text, or None if it intersects a
    removed interval."""
    cut_starts = [c[0] for c in cuts]
    # prefix removed-length before a position
    removed_before: list[int] = []
    total = 0
    for a, b in cuts:
        removed_before.append(total)
        total += b - a
    out: list[tuple[int, int] | None] = []
    for s, e in spans:
        dropped = False
        for a, b in cuts:
            if s < b and a < e:
                dropped = True
                break
        if dropped:
            out.append(None)
            continue
        i = bisect_right(cut_starts, s)
        shift = removed_before[i - 1] + (cuts[i - 1][1] - cuts[i - 1][0]) if i else 0
        out.append((s - shift, e - shift))
    return out


def fix_trailing_space(text: str, start: int, end: int) -> tuple[int, int]:
    """Shrink [start, end) so neither edge is whitespace."""
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    return start, end
