"""Streaming parity queries (SURVEY.md §2.E) — filled in M3."""
