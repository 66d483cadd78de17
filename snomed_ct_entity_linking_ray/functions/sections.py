"""Section splitting / header classification (SURVEY.md M2/M3).

Semantics modeled on 1st Place/src/mimic_common.py:94-124 (``get_sections``)
and :81-91 (header classify): a section starts at a line ``<Header>:`` whose
header is in the known list; text before the first header belongs to the
pseudo-section ``"other"``. Pure per-row function, applied inside
``map_batches`` — cheap and deterministic, recomputed on demand rather than
carried (SURVEY.md §1.4 section row).
"""

from __future__ import annotations

import re
from bisect import bisect_right

_HEADER_LINE = re.compile(r"^([A-Z][A-Za-z /]{2,60}):\s*$", re.M)


def find_sections(text: str, known_headers: frozenset[str] | None = None):
    """Return list of (header, start, end) covering [0, len(text)).

    ``start`` is the char offset of the header line itself; ``end`` is the
    start of the next section (or len(text)). Headers not in
    ``known_headers`` (when given) are mapped to ``"other"`` — M3 semantics
    (1st Place/src/mimic_common.py:81-91).
    """
    out = []
    prev_start = 0
    prev_header = "other"
    for m in _HEADER_LINE.finditer(text):
        if m.start() > prev_start or prev_header != "other":
            out.append((prev_header, prev_start, m.start()))
        hdr = m.group(1)
        if known_headers is not None and hdr not in known_headers:
            hdr = "other"
        prev_header = hdr
        prev_start = m.start()
    out.append((prev_header, prev_start, len(text)))
    if not out or (len(out) == 1 and out[0][1] == out[0][2]):
        return [("other", 0, len(text))]
    return out


class SectionIndex:
    """Binary-search lookup: char offset -> governing header."""

    def __init__(self, sections: list[tuple[str, int, int]]):
        self.starts = [s for _, s, _ in sections]
        self.headers = [h for h, _, _ in sections]

    def header_at(self, pos: int) -> str:
        i = bisect_right(self.starts, pos) - 1
        return self.headers[max(0, i)]
