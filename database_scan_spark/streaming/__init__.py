"""Structured Streaming jobs (filled in a later milestone)."""
