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


# ── connection lifecycle — the reference's reconnect semantics ──────
#
# The reference wraps each configured connection in a node domain and,
# when a FATAL connection-lost error surfaces (Postgres SQLSTATE
# `57P01` admin_shutdown, node-mysql `PROTOCOL_CONNECTION_LOST`),
# re-runs its connect thunk; any OTHER error re-throws
# (`/root/reference/index.js:96-109`). Spark has no long-lived pooled
# connection to babysit — every JDBC task opens a fresh connection —
# so "reconnect" maps to RE-RUNNING THE ACTION: the retried read
# opens new connections exactly as connectThunk re-created the pool.

#: error signatures that mean "the CONNECTION died", not "the query is
#: wrong": the reference's two literal codes plus standard SQLSTATE
#: class 08 (connection exception — 08001 cannot-connect, 08003
#: connection-does-not-exist, 08004 rejected, 08006 connection
#: failure, 08S01 communication link failure; Derby signals a clean
#: shutdown as 08006, which gives the embedded e2e test a REAL
#: connection-termination to recover from).
RECONNECT_SIGNATURES = (
    "57P01",
    "PROTOCOL_CONNECTION_LOST",
    "08001",
    "08003",
    "08004",
    "08006",
    "08S01",
)


#: signatures as standalone tokens: a bare substring scan would let a
#: longer digit run embed a code ('Task 308001 failed' contains
#: '08001') and misclassify a query error as connection loss
_RECONNECT_RE = re.compile(
    "|".join(
        f"(?<![0-9A-Za-z]){re.escape(sig)}(?![0-9A-Za-z])"
        for sig in RECONNECT_SIGNATURES
    )
)


def is_connection_lost(exc: BaseException) -> bool:
    """True iff the exception chain carries a connection-terminated
    signature (`RECONNECT_SIGNATURES`, matched as standalone tokens).
    Py4J flattens the remote SQLException chain into the message
    text, so a string scan over the chain sees the SQLState wherever
    the JVM put it."""
    seen: set[int] = set()
    while exc is not None and id(exc) not in seen:
        seen.add(id(exc))
        if _RECONNECT_RE.search(str(exc)):
            return True
        exc = exc.__cause__ or exc.__context__
    return False


def with_reconnect(action, retries: int = 1, on_reconnect=None):
    """Run ``action()``; on a connection-lost failure, retry up to
    ``retries`` times (the reference reconnects indefinitely per
    event; one bounded retry per call is the sane batch analog —
    a still-down server then fails loudly). Non-connection errors
    propagate unchanged, mirroring the reference's
    ``cerr('Uncaught DB error!'); throw e``. ``on_reconnect(attempt,
    exc)`` observes each recovery (the reference logs
    'Reconnecting...')."""
    import warnings

    attempt = 0
    while True:
        try:
            return action()
        except Exception as exc:
            if attempt >= retries or not is_connection_lost(exc):
                raise
            attempt += 1
            if on_reconnect is not None:
                on_reconnect(attempt, exc)
            else:
                warnings.warn(
                    f"DB connection terminated ({exc!s:.120}); "
                    f"reconnecting (attempt {attempt}/{retries})",
                    stacklevel=2,
                )
