"""Gold feature-library queries (SURVEY.md §2.9) — placeholder, filled in
incrementally."""
