"""Pure, deterministic kernels shared by stages (SURVEY.md §2.8)."""
