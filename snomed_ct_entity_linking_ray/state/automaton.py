"""Aho-Corasick automaton for multi-pattern dictionary matching.

Replaces the reference's two matching strategies that don't scale:
per-entry regex finditer over every note (1st Place/src/mimic_common.py:
127-161, M4) and one giant alternation regex (2nd Place/submission/
static_dict.py:36-53, M18). Classic public algorithm (Aho & Corasick 1975);
built once driver-side, broadcast via ``ray.put``, matched inside actor
pools.

Matching is over NORMALIZED text (functions.text.normalize_text), with
word-boundary post-filtering so only full-word matches are emitted (both
reference matchers are word-bounded: ``\\b(t1|t2|..)\\b``).
"""

from __future__ import annotations


class AhoCorasick:
    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns: dict[str, int]):
        """patterns: normalized surface -> pattern id (any int payload)."""
        # nodes as list of dict transitions
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[int, int]]] = [[]]  # node -> [(pat_len, pid)]
        for pat, pid in patterns.items():
            if not pat:
                continue
            node = 0
            for ch in pat:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append((len(pat), pid))
        # BFS failure links
        from collections import deque

        self.fail = [0] * len(self.goto)
        q = deque()
        for ch, nxt in self.goto[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self.goto[node].items():
                q.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def find_all(self, text: str) -> list[tuple[int, int, int]]:
        """All matches as (start, end, pid), half-open char offsets."""
        res = []
        node = 0
        goto = self.goto
        fail = self.fail
        out = self.out
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for plen, pid in out[node]:
                    res.append((i + 1 - plen, i + 1, pid))
        return res

    def find_words(self, text: str) -> list[tuple[int, int, int]]:
        """Full-word matches only: both ends at alnum boundaries."""
        n = len(text)
        res = []
        for s, e, pid in self.find_all(text):
            if s > 0 and (text[s - 1].isalnum()):
                continue
            if e < n and text[e].isalnum():
                continue
            res.append((s, e, pid))
        return res
