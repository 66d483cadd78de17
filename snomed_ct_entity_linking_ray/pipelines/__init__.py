"""Composed Ray Data pipelines: the flagship entity-linking pipeline plus the
relational / text-analysis / dedup / similarity operator families
(SURVEY.md §2 inventory + the large-scale training-data additions)."""
