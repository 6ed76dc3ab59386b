"""Source/sink connectors beyond the driver's Parquet fixtures.

The reference federates pg/MySQL/Salesforce/REST behind named
connections (`/root/reference/config.json:11-53`); the Spark-native
equivalent is `spark.read.format(...)` — one engine, many formats.
Parquet is the primary format (columnar, predicate pushdown, page
skipping); CSV/JSON exist for ingestion edges, ORC for parity.

Every reader takes an explicit schema where the format can't carry
one: `inferSchema` is a full extra pass over the data — never an
option at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")


class UnsupportedFormatError(ValueError):
    pass


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched reader with explicit-schema discipline."""
    if fmt not in SUPPORTED_FORMATS:
        raise UnsupportedFormatError(
            f"format {fmt!r} not supported (have: {SUPPORTED_FORMATS})"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(
            f"{fmt} requires an explicit schema (inferSchema is a full "
            "extra data pass — unacceptable at scale)"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Sink with the scale layout contract: fact tables partition by a
    date-derived column (partition pruning turns time filters into
    directory pruning); target file sizes come from upstream
    repartitioning, not the writer."""
    if fmt not in SUPPORTED_FORMATS:
        raise UnsupportedFormatError(
            f"format {fmt!r} not supported (have: {SUPPORTED_FORMATS})"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on `bucket_cols`
    skip their shuffle entirely (both sides pre-hashed into the same
    bucket layout). The co-located-join primitive for 100 TB fact⋈fact
    joins; requires saveAsTable (bucket metadata lives in the
    catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
