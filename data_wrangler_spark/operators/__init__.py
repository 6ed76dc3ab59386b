"""Operator builders. Importing this package populates the registry."""

from data_wrangler_spark.operators import core  # noqa: F401
