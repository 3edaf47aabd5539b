"""Dataflow operators (SURVEY.md §2): assembly, blocking, features, scoring,
resolution, clustering, dedup, similarity search, text analysis."""
