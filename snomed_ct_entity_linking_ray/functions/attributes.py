"""Attribute post-processing (SURVEY.md M12).

``extend_laterality`` reproduces the semantics of
1st Place/src/mimic_postprocess_attributes.py:6-105: for a linked span
whose concept has a more-specific lateralized child (the extension table),
look in a bounded window before the span (≤ 2 words / ≤ 20 chars, clipped
by the previous span's end); if a laterality word is found, extend the span
start to cover it and swap the concept to the specific child.
"""

from __future__ import annotations

import re

LATERALITY_WORDS = {
    "left": "left",
    "l": "left",
    "lt": "left",
    "right": "right",
    "r": "right",
    "rt": "right",
    "left-sided": "left",
    "right-sided": "right",
}

_WINDOW_RE = re.compile(r"(\S+)\s+$")


def extend_laterality(
    text: str,
    spans: list[dict],
    extension_table: dict[tuple[int, str], int],
    window_chars: int = 20,
) -> list[dict]:
    """spans: sorted dicts (start, end, concept_id). extension_table maps
    (parent_concept_id, side) → child_concept_id. Returns new span dicts;
    non-matching spans unchanged."""
    out = []
    prev_end = 0
    for sp in sorted(spans, key=lambda s: (s["start"], s["end"])):
        start, end, cid = sp["start"], sp["end"], sp["concept_id"]
        new_sp = dict(sp)
        window_start = max(prev_end, start - window_chars)
        window = text[window_start:start]
        m = _WINDOW_RE.search(window)
        if m:
            word = m.group(1).lower().strip(",.;:")
            side = LATERALITY_WORDS.get(word)
            if side is not None:
                child = extension_table.get((cid, side))
                if child is not None:
                    new_sp["start"] = window_start + m.start(1)
                    new_sp["concept_id"] = child
        out.append(new_sp)
        prev_end = new_sp["end"]
    return out
