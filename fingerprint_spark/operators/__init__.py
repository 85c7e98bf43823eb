"""Operator layer: assertions, match fold, extraction, hashing, dedup,
similarity search, infer, struct-check."""
