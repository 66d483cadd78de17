"""Explicit Arrow schemas for every logical table (SURVEY.md §1.4).

The reference has only implicit pandas/CSV schemas; a fixed, explicit
``pyarrow.Schema`` per table is an engine addition (SURVEY.md §1.4 last row).
Shapes mirror the reference contracts:

- ``DOCS``      the ``input_hint`` interleaved-span document table
- ``MENTIONS``  annotation spans (1st Place/src/mimic_submission_main.py:25-26)
- ``CONCEPTS``  terminology rows (1st Place/src/process_data.py:35-72)
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),        # "text" | "media"
        pa.field("text", pa.string()),        # non-empty iff kind == "text"
        pa.field("media_ref", pa.string()),   # "" for text; "media://<hash>" for media
        pa.field("offset", pa.int32()),       # char offset in reconstructed doc text
    ]
)

DOCS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

CONCEPTS = pa.schema(
    [
        pa.field("concept_id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("kind", pa.string()),        # "FSN" | "SYN"
        pa.field("hierarchy", pa.string()),   # "finding" | "procedure" | "body structure"
    ]
)

GOLD_MENTIONS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("concept_id", pa.int64()),
        pa.field("section", pa.string()),
        pa.field("surface", pa.string()),
    ]
)

GOLD_PAIRS = pa.schema(
    [
        pa.field("block_key", pa.string()),
        pa.field("left_id", pa.string()),     # "<doc_id>:<start>"
        pa.field("right_id", pa.string()),    # "concept:<concept_id>"
        pa.field("label", pa.bool_()),
    ]
)

EXPECTED_CLUSTERS = pa.schema(
    [
        pa.field("mention_id", pa.string()),
        pa.field("cluster_id", pa.int64()),
        pa.field("concept_id", pa.int64()),
    ]
)

# Pipeline-internal tables -------------------------------------------------

MENTIONS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        # index into the broadcast surface list — mention rows are string-
        # free past extraction; surfaces are restored by broadcast lookup
        pa.field("sid", pa.int32()),
        pa.field("section", pa.string()),
        # rows the doc emitted at extraction (doc-contiguity invariant)
        pa.field("doc_n", pa.int32()),
    ]
)

CANDIDATE_PAIRS = pa.schema(
    [
        pa.field("block_key", pa.string()),
        pa.field("left_id", pa.string()),
        pa.field("right_id", pa.string()),
        pa.field("left_text", pa.string()),
        pa.field("right_text", pa.string()),
    ]
)

SCORED_PAIRS = CANDIDATE_PAIRS.append(pa.field("score", pa.float64()))

LINKED_MENTIONS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("concept_id", pa.int64()),
    ]
)
