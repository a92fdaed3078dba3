"""Text-analysis queries over documents — placeholder."""
