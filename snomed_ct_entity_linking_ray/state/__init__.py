"""Broadcast-once, read-everywhere artifacts (SURVEY.md §2.3).

Everything here is built driver-side (or in one Ray task), shipped to the
object store with ``ray.put`` ONCE, and loaded per-actor in ``__init__`` —
never re-shipped per batch, never mutated cross-task (SURVEY.md §7.5:
module-global caches in the reference become broadcast artifacts here).
"""
