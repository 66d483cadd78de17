"""snomed_ct_entity_linking_ray — a Ray-Data-native record-linkage engine.

A from-scratch re-expression of the query/data-processing capabilities of
drivendataorg/snomed-ct-entity-linking (see SURVEY.md) as idiomatic Ray Data
pipelines: blocking + pairwise scoring + transitive clustering over Arrow
tables of interleaved text+media documents, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) such an engine needs at 100 TB scale.

Layout
------
- ``schemas``    explicit pyarrow schemas for every logical table
- ``fixtures``   deterministic synthetic docs/concepts/gold tables (seeded)
- ``functions``  pure vectorized kernels (normalize, sections, overlaps, sims)
- ``state``      broadcast artifacts (Aho-Corasick automaton, embedding index)
- ``stages``     map_batches / actor-pool stage wrappers
- ``sources``    readers/writers incl. checkpointed partitioned parquet
- ``pipelines``  composed end-to-end pipelines (entity_link, dedup, ...)

No module in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
