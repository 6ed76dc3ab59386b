"""Scalar/array/map/json function query builders + shared helpers."""
