"""BIO tag decoding + span stitching (SURVEY.md M15).

Reproduces the semantics of 2nd Place/submission/infer.py:57-125
(``join_classes_bio`` :90-104, ``fix_spans`` :107-125): per-token class ids
(argmax of model logits) become char spans; adjacent B-x/I-x runs merge
when the char gap between them is ≤ ``max_gap``; span edges are shrunk off
whitespace. Model-free: the decoder consumes any (token_offsets, class_id)
stream, so tests feed synthetic predictions and a real NER actor pool
(A2-class) can slot in upstream without changing this code.

Class id convention: 0 = O (outside); odd ids are B-k, even ids are I-k
for entity class k = (id+1)//2.
"""

from __future__ import annotations


def entity_class(class_id: int) -> int:
    return 0 if class_id <= 0 else (class_id + 1) // 2


def is_begin(class_id: int) -> bool:
    return class_id > 0 and class_id % 2 == 1


def decode_bio(
    token_offsets: list[tuple[int, int]],
    class_ids: list[int],
    max_gap: int = 2,
) -> list[tuple[int, int, int]]:
    """→ [(start, end, entity_class)] char spans, gap-merged per class."""
    assert len(token_offsets) == len(class_ids)
    raw: list[list[int]] = []  # [start, end, cls]
    for (s, e), cid in zip(token_offsets, class_ids):
        k = entity_class(cid)
        if k == 0:
            continue
        if raw and raw[-1][2] == k and not is_begin(cid) and s - raw[-1][1] <= max_gap:
            raw[-1][1] = e
        else:
            raw.append([s, e, k])
    return [(s, e, k) for s, e, k in raw]


def fix_spans(text: str, spans: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Strip whitespace off span edges; drop spans that become empty."""
    out = []
    for s, e, k in spans:
        while s < e and text[s].isspace():
            s += 1
        while e > s and text[e - 1].isspace():
            e -= 1
        if s < e:
            out.append((s, e, k))
    return out
