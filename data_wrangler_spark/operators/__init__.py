"""Operator builders. Importing this package populates the registry."""

from data_wrangler_spark.operators import (  # noqa: F401
    aggregates,
    behavioral,
    core,
    dedup,
    embeddings_ext,
    graph,
    joins,
    multimodal,
    pipeline_ops,
    quality_ts,
    relational_extras,
    setops,
    statistics,
    similarity,
    sketches,
    text_analysis,
    tpch,
    tpch_more,
    udx,
    windows,
)
