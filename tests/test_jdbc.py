"""JDBC federation builder validation (no live RDBMS in the
container — the option surface and guards are the testable part;
the URL/option contract is Spark's public jdbc source)."""

import pytest

from data_wrangler_spark.sources.jdbc import (
    JdbcConfigError,
    jdbc_options,
    read_jdbc_query,
)


def _base(**over):
    kw = dict(
        adapter="pg",
        host="db.example.internal",
        database="warehouse",
        table="orders",
        user="reader",
    )
    kw.update(over)
    return kw


def test_basic_options_shape():
    opts = jdbc_options(**_base())
    assert opts["url"] == "jdbc:postgresql://db.example.internal:5432/warehouse"
    assert opts["dbtable"] == "orders"
    assert opts["fetchsize"] == "10000"
    assert "partitionColumn" not in opts


def test_mysql_port_default_and_override():
    assert "3306" in jdbc_options(**_base(adapter="mysql"))["url"]
    assert ":5433/" in jdbc_options(**_base(port=5433))["url"]


def test_partitioned_read_quartet():
    opts = jdbc_options(
        **_base(
            partition_column="o_orderkey",
            lower_bound=1,
            upper_bound=1_000_000,
            num_partitions=64,
        )
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "64"
    with pytest.raises(JdbcConfigError, match="needs partition_column"):
        jdbc_options(**_base(partition_column="o_orderkey"))
    with pytest.raises(JdbcConfigError, match="lower_bound"):
        jdbc_options(
            **_base(
                partition_column="o_orderkey",
                lower_bound=10,
                upper_bound=10,
                num_partitions=4,
            )
        )


def test_rejects_bad_adapter_and_identifiers():
    with pytest.raises(JdbcConfigError, match="unsupported adapter"):
        jdbc_options(**_base(adapter="oracle"))
    with pytest.raises(JdbcConfigError, match="invalid table"):
        jdbc_options(**_base(table="orders; drop table x"))
    with pytest.raises(JdbcConfigError, match="invalid partition column"):
        jdbc_options(
            **_base(
                partition_column="1=1 --",
                lower_bound=0,
                upper_bound=10,
                num_partitions=2,
            )
        )


def test_query_delegation_guards(spark):
    with pytest.raises(JdbcConfigError, match="refused"):
        read_jdbc_query(
            spark,
            adapter="pg",
            host="h",
            database="d",
            user="u",
            query="SELECT 1; DROP TABLE x",
        )
    with pytest.raises(JdbcConfigError, match="refused"):
        read_jdbc_query(
            spark, adapter="pg", host="h", database="d", user="u",
            query="SELECT 1 -- sneaky",
        )
    # a clean single statement passes the guards and reaches Spark's
    # jdbc source — which fails fast on the missing driver jar (no
    # RDBMS in this container), proving the options were accepted
    with pytest.raises(Exception, match="[Dd]river"):
        read_jdbc_query(
            spark,
            adapter="pg",
            host="unreachable.example.internal",
            database="d",
            user="u",
            query="SELECT 1 AS one",
        )
