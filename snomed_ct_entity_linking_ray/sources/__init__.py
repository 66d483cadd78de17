"""Readers and checkpointed writers (SURVEY.md §2.1 S-operators)."""
