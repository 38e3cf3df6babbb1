"""DataFrame → DataFrame operators implementing SURVEY.md §2."""
