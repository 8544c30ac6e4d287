"""Structured Streaming operators (engine extension: the reference is
batch-only — SURVEY.md §2.5 'Streaming: none')."""
