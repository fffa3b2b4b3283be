"""Multimodal binary-column plumbing."""
