"""Structured-Streaming operators (windows, watermarks, dedup)."""
