"""Shared column-expression helpers (datetime, hashing, vectors)."""
