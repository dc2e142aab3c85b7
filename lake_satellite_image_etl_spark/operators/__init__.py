"""Relational + custom operators (SURVEY.md §2)."""
