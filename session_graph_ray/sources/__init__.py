"""Input connectors beyond Parquet (SURVEY.md §2.1 S1-S4)."""
