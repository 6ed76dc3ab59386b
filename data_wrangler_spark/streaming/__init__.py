"""Structured-Streaming operators (windows, watermarks, dedup)."""

from data_wrangler_spark.streaming import windows  # noqa: F401
