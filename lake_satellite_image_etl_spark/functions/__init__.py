"""Scalar / vector / text function surface (SURVEY.md §2.8)."""
