"""Structured Streaming surface (SURVEY.md §2.10, all EXT — the
reference is batch-only)."""
