"""Operator builders. Importing this package populates the registry."""

from data_wrangler_spark.operators import (  # noqa: F401
    aggregates,
    behavioral,
    core,
    dedup,
    joins,
    multimodal,
    pipeline_ops,
    relational_extras,
    setops,
    similarity,
    sketches,
    text_analysis,
    udx,
    windows,
)
