"""Structured Streaming variants of the incremental-maintenance patterns
(SURVEY.md §2.10)."""
