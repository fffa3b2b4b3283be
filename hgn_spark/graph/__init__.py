"""Graph layer."""
