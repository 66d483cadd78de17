"""Per-document overlapping-span resolution (SURVEY.md D2/D3).

``remove_overlaps`` reproduces the reference semantics of
1st Place/src/mimic_common.py:170-209: sort spans by start (stable), sweep
pairwise, drop the "shorter" span where effective length applies a -0.1
penalty to entries matched under the generic "any" section key (so a
section-specific match beats an equal-length generic one), then a second
pass re-adds dropped spans that no longer overlap anything kept.

Deterministic tie-breaks: ``(start, -length, concept_id)`` — required for
bit-exact span sequences (SURVEY.md §7.5).
"""

from __future__ import annotations


def effective_len(start: int, end: int, generic: bool) -> float:
    return (end - start) - (0.1 if generic else 0.0)


def remove_overlaps(spans: list[dict]) -> list[dict]:
    """spans: dicts with start, end, concept_id, and optional generic:bool.

    Returns the kept spans sorted by (start, end, concept_id), pairwise
    non-overlapping (half-open intervals).
    """
    if not spans:
        return []
    order = sorted(
        spans,
        key=lambda s: (s["start"], -(s["end"] - s["start"]), s.get("concept_id", 0)),
    )
    kept: list[dict] = []
    dropped: list[dict] = []
    for s in order:
        clash = None
        for k in kept:
            if s["start"] < k["end"] and k["start"] < s["end"]:
                clash = k
                break
        if clash is None:
            kept.append(s)
            continue
        sl = effective_len(s["start"], s["end"], s.get("generic", False))
        kl = effective_len(clash["start"], clash["end"], clash.get("generic", False))
        if sl > kl:
            kept.remove(clash)
            dropped.append(clash)
            # the newly kept span may clash with others; re-check
            still = [
                k for k in kept if s["start"] < k["end"] and k["start"] < s["end"]
            ]
            if not still:
                kept.append(s)
            else:
                dropped.append(s)
        else:
            dropped.append(s)
    # second pass: re-add dropped spans that no longer overlap
    # (1st Place/src/mimic_common.py second sweep semantics)
    for s in sorted(
        dropped,
        key=lambda s: (s["start"], -(s["end"] - s["start"]), s.get("concept_id", 0)),
    ):
        if all(not (s["start"] < k["end"] and k["start"] < s["end"]) for k in kept):
            kept.append(s)
    kept.sort(key=lambda s: (s["start"], s["end"], s.get("concept_id", 0)))
    return kept


def interval_anti_join(
    keep_if_clear: list[tuple[int, int]], blockers: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """J7 (2nd Place/submission/static_dict.py:56-77): keep a candidate
    interval only if it overlaps NO blocker interval — a per-doc sweep-line
    over both lists sorted by start."""
    from bisect import bisect_right

    # coalesce blockers into disjoint sorted intervals
    merged: list[list[int]] = []
    for b_s, b_e in sorted(blockers):
        if merged and b_s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b_e)
        else:
            merged.append([b_s, b_e])
    starts = [m[0] for m in merged]

    out = []
    for s, e in sorted(keep_if_clear):
        i = bisect_right(starts, e - 1) - 1  # last blocker starting before e
        if i >= 0 and merged[i][1] > s:
            continue
        out.append((s, e))
    return out
