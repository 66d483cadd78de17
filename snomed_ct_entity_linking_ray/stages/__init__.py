"""Reusable Ray Data stage building blocks (actor pools, shuffle stages)."""
