"""Synthetic deterministic web-table generation (seed=42) + table readers."""
