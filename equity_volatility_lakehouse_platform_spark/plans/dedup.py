"""Deduplication queries over documents — placeholder."""
