"""Model-echo realignment + context extraction (SURVEY.md M23/M25).

``realign_span`` maps a span found in a model's echoed/mutated copy of a
chunk back to char offsets in the original text using difflib sequence
alignment — the semantics of 3rd Place/src/document.py:474-606 (tag
stripping + SequenceMatcher opcode walk :635-665). ``extract_context``
reproduces the ±N-word context window with section-conditioned templates
(3rd Place/src/snomedctentitylinking.py:558-592, document.py:855-871).
"""

from __future__ import annotations

from difflib import SequenceMatcher


def echo_to_original_map(original: str, echoed: str) -> list[int]:
    """For each char position in ``echoed``, the best-aligned position in
    ``original`` (monotone; -1 where the echo inserted new text)."""
    sm = SequenceMatcher(None, echoed, original, autojunk=False)
    out = [-1] * (len(echoed) + 1)
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            for k in range(i2 - i1):
                out[i1 + k] = j1 + k
        elif tag == "replace":
            span = max(1, i2 - i1)
            for k in range(i2 - i1):
                out[i1 + k] = j1 + min(j2 - j1 - 1, (k * (j2 - j1)) // span) if j2 > j1 else -1
    out[len(echoed)] = len(original)
    return out


def realign_span(original: str, echoed: str, e_start: int, e_end: int):
    """Map [e_start, e_end) in the echo to original offsets; returns
    (start, end) or None when the span lies in inserted text."""
    mapping = echo_to_original_map(original, echoed)
    starts = [mapping[i] for i in range(e_start, e_end) if mapping[i] >= 0]
    if not starts:
        return None
    return min(starts), max(starts) + 1


def extract_context(
    text: str,
    start: int,
    end: int,
    n_words: int = 5,
    section: str | None = None,
) -> str:
    """±n_words window around the span; section-conditioned templates for
    the scoring text (M25): allergy/procedure/disorder framings."""
    before = text[:start].split()[-n_words:]
    after = text[end:].split()[:n_words]
    term = text[start:end]
    ctx = " ".join(before + [term] + after)
    if section:
        s = section.lower()
        if "allerg" in s:
            return f"Allergy to {term} finding | {ctx}"
        if "procedure" in s or "surgical" in s:
            return f"{term} procedure | {ctx}"
        if "diagnosis" in s or "complaint" in s:
            return f"Disorder of {term} | {ctx}"
    return ctx
