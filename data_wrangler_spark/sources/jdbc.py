"""JDBC federation — the Spark-native counterpart of the reference's
node-dbi Postgres/MySQL connections.

The reference declares named connections in config
(`/root/reference/config.json:11-18` — adapter, host, database,
user, password) and funnels every query through
`db.fetchAll(sql, args)` (`/root/reference/index.js:230-252`), so
the remote RDBMS does all relational work. Spark's JDBC source is
the same delegation boundary with two upgrades the reference can't
express:

- **partitioned parallel reads**: N executors each pull a
  stride of the table (`partitionColumn` + bounds), instead of the
  reference's single-connection single-stream fetch;
- **pushdown**: filters/column pruning (and, via
  ``read_jdbc_query``, an arbitrary SQL subquery) execute remotely,
  exactly like the reference's whole-query delegation — but
  composable with local DataFrame post-processing.

No networked RDBMS exists in this container, but the embedded Derby
engine in Spark's own jars gives the builders a LIVE end-to-end
check: tests/test_jdbc.py seeds a Derby database over plain
java.sql and reads it back through `read_jdbc` /
`read_jdbc_query` — real driver, real SQL, real result cursor. The
pg/mysql adapters differ only in URL string.

Scale notes: `numPartitions` × `fetchsize` is the ingest
parallelism knob — size it to the source's connection budget, not
the cluster's core count (a 1000-executor cluster can trivially DoS
a Postgres primary; readers should hit a replica). Skewed
partitionColumn histograms need manual `predicates` ranges; bounds
outside the real min/max silently produce empty/fat edge strides.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: adapter name (reference config.json `adapter`) → JDBC URL scheme.
#: `derby` is the in-process embedded backend (`database` is a
#: filesystem path, host/port unused) — it ships in Spark's own jars,
#: so federation integration-tests run a REAL JDBC round trip with no
#: external server; the pg/mysql adapters differ only in URL.
URL_TEMPLATES = {
    "pg": "jdbc:postgresql://{host}:{port}/{database}",
    "mysql": "jdbc:mysql://{host}:{port}/{database}",
    "derby": "jdbc:derby:{database}",
}

DEFAULT_PORTS = {"pg": 5432, "mysql": 3306}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


class JdbcConfigError(ValueError):
    pass


def _check_ident(name: str, what: str) -> str:
    """Reject injection-shaped identifiers — the engine-side mirror of
    the reference's `validateQueryVars` alphanumeric gate
    (`/root/reference/lib/examiner.js:162-196`)."""
    if not _IDENT.match(name):
        raise JdbcConfigError(f"invalid {what}: {name!r}")
    return name


def jdbc_options(
    adapter: str,
    host: str,
    database: str,
    table: str,
    user: str,
    password: str = "",
    port: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Build the validated option map for a JDBC table read. The
    partitioning quartet is all-or-nothing: Spark requires column +
    both bounds + partition count together for strided reads."""
    if adapter not in URL_TEMPLATES:
        raise JdbcConfigError(
            f"unsupported adapter {adapter!r} (have: {sorted(URL_TEMPLATES)})"
        )
    _check_ident(table, "table")
    opts = {
        "url": URL_TEMPLATES[adapter].format(
            host=host, port=port or DEFAULT_PORTS.get(adapter, 0), database=database
        ),
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetchsize),
    }
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise JdbcConfigError(
                "partitioned read needs partition_column, lower_bound, "
                "upper_bound AND num_partitions"
            )
        if lower_bound >= upper_bound:
            raise JdbcConfigError("lower_bound must be < upper_bound")
        if num_partitions < 1:
            raise JdbcConfigError("num_partitions must be >= 1")
        opts.update(
            {
                "partitionColumn": _check_ident(partition_column, "partition column"),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """Lazy JDBC table reader. Filters and projections applied to the
    returned DataFrame push down into the remote scan (visible as
    PushedFilters in the JDBC relation's plan)."""
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


def read_jdbc_query(
    spark: SparkSession,
    adapter: str,
    host: str,
    database: str,
    query: str,
    user: str,
    password: str = "",
    port: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Whole-query delegation — the reference's exact execution model
    (`fetchAll(sql)`, remote engine does everything) as a Spark
    source: the SQL text runs remotely and the result streams in as
    a DataFrame. Comment-free single statements only (mirror of the
    reference's comment rejection in examiner.js:171-176)."""
    if ";" in query.rstrip().rstrip(";") or "--" in query or "/*" in query:
        raise JdbcConfigError("multi-statement or commented SQL refused")
    if adapter not in URL_TEMPLATES:
        raise JdbcConfigError(
            f"unsupported adapter {adapter!r} (have: {sorted(URL_TEMPLATES)})"
        )
    url = URL_TEMPLATES[adapter].format(
        host=host, port=port or DEFAULT_PORTS.get(adapter, 0), database=database
    )
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", str(fetchsize))
        .load()
    )
