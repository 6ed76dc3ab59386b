"""data_wrangler_spark — a PySpark-native analytics engine.

Re-expresses the query surface of the reference gateway
(`iqumulus/data-wrangler`, a REST-to-SQL federation gateway — see
SURVEY.md) as an idiomatic Spark DataFrame/SQL layer, plus the
north-star large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns, streaming windows).

Public API:
    from data_wrangler_spark import engine
    eng = engine.Engine(spark, sf_dir)
    df  = eng.run("q_inner_join")          # any registered query
    data_wrangler_spark.queries()          # driver-harness dict
    data_wrangler_spark.oracle_sql()       # DuckDB oracle dict
"""

from data_wrangler_spark.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
    register,
)
from data_wrangler_spark.catalog import Catalog, TABLES  # noqa: F401
from data_wrangler_spark.engine import Engine  # noqa: F401

# Importing the operator packages populates the registry.
from data_wrangler_spark import operators as _operators  # noqa: F401
from data_wrangler_spark import functions as _functions  # noqa: F401
from data_wrangler_spark import streaming as _streaming  # noqa: F401

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "register",
    "queries",
    "oracle_sql",
    "Catalog",
    "TABLES",
    "Engine",
]
