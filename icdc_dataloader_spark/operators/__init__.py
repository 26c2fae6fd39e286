"""Relational + CDC operators (SURVEY.md §2): dedup, validation,
relationship resolution, cascade delete, similarity search, text analysis."""
