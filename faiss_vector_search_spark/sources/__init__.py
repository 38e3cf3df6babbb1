"""Ingestion sources: files → DataFrames (SURVEY.md §2a #16/#17, §2b #29)."""
