"""Dictionary-entry expansion operators (SURVEY.md M7–M10).

Semantics modeled on the reference's synonym gates and expanders:
- ``synonym_gate``        M7  1st Place/src/mimic_train.py:137-153
- ``word_permutations``   M8  1st Place/src/mimic_train.py:198-222
- ``word_replacements``   M9  1st Place/src/mimic_train.py:225-240
- ``uppercase_fraction``  M10 1st Place/src/mimic_train.py:422-433

Pure functions over dictionary entries — used when building the match
dictionary from a terminology table, and individually unit-tested.
"""

from __future__ import annotations

from itertools import permutations

PERMUTE_BLACKLIST = {"with", "without", "and", "or", "to", "in"}

REPLACEMENT_RULES: list[tuple[str, str]] = [
    (",", ""),
    (" and ", " with "),
    (" with ", " and "),
    (" valve ", " "),
    (" of ", " of the "),
]


def synonym_gate(
    term: str, min_words: int = 1, max_words: int = 6
) -> bool:
    """M7: reject synonyms that are too short, bracketed, machine
    translation artifacts, or out of word-count bounds."""
    if len(term) < 3:
        return False
    if "machine translation" in term.lower():
        return False
    if term.startswith("[") or term.startswith("("):
        return False
    if not term[0].isalnum():
        return False
    n = len(term.split())
    return min_words <= n <= max_words


def word_permutations(term: str, max_variants: int = 24) -> list[str]:
    """M8: for 2-word terms swap; for "X of Y" emit "Y X"; for 3–4-word
    terms without blacklisted words emit all permutations."""
    words = term.split()
    out: list[str] = []
    if len(words) == 3 and words[1] == "of":
        out.append(f"{words[2]} {words[0]}")
    elif len(words) == 2:
        out.append(f"{words[1]} {words[0]}")
    elif 3 <= len(words) <= 4 and not (set(words) & PERMUTE_BLACKLIST):
        for p in permutations(words):
            cand = " ".join(p)
            if cand != term:
                out.append(cand)
            if len(out) >= max_variants:
                break
    seen: set[str] = set()
    uniq = []
    for v in out:
        if v not in seen:
            seen.add(v)
            uniq.append(v)
    return uniq


def word_replacements(term: str) -> list[str]:
    """M9: apply each single replacement rule that fires."""
    out = []
    for old, new in REPLACEMENT_RULES:
        if old in term:
            cand = term.replace(old, new).strip()
            cand = " ".join(cand.split())
            if cand and cand != term:
                out.append(cand)
    seen: set[str] = set()
    uniq = []
    for v in out:
        if v not in seen:
            seen.add(v)
            uniq.append(v)
    return uniq


def uppercase_fraction(surfaces: list[str]) -> float:
    """M10 input: fraction of observed surface forms that are ALL-CAPS;
    ≥0.99 moves the entry to the case-sensitive dictionary."""
    if not surfaces:
        return 0.0
    return sum(1 for s in surfaces if s.isupper()) / len(surfaces)


def expand_entry(term: str) -> list[str]:
    """Full expansion chain for one dictionary entry (gate → permute →
    replace), mirroring add_external_dicts' chaining
    (1st Place/src/mimic_train.py:446-472)."""
    if not synonym_gate(term):
        return []
    out = [term]
    out.extend(word_permutations(term))
    out.extend(word_replacements(term))
    seen: set[str] = set()
    uniq = []
    for v in out:
        if v not in seen:
            seen.add(v)
            uniq.append(v)
    return uniq
