"""Structured Streaming ingest path (beyond-parity: the reference is
purely batch, SURVEY §2.8)."""
