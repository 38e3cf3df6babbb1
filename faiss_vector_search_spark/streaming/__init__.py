"""Structured Streaming variants (SURVEY.md §2c #35/#36)."""
