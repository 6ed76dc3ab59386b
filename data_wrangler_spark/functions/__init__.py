"""Scalar/array/map/json function query builders + shared helpers."""

from data_wrangler_spark.functions import scalars  # noqa: F401
