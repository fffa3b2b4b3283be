"""Logical-plan helpers."""
