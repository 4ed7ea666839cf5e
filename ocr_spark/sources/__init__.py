"""Input connectors beyond plain parquet (SURVEY.md §2.1 S1)."""
