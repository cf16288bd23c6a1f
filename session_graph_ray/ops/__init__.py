"""Reusable distributed operators (SURVEY.md §2 inventory + the
training-data-pipeline extensions: dedup, similarity search, text analysis,
multimodal plumbing)."""
