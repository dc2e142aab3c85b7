"""Composed query plans (the engine's "entry point" queries)."""
