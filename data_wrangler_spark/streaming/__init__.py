"""Structured-Streaming operators (windows, watermarks, dedup)."""

from data_wrangler_spark.streaming import stateful, windows  # noqa: F401
