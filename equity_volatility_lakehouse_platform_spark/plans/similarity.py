"""Similarity-search queries over embeddings — placeholder."""
