"""Structured Streaming analogs of the reference's scheduled
incremental batch (SURVEY.md §2.9 T1-T3)."""
