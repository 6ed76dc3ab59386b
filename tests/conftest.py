import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from data_wrangler_spark.session import get_spark

    s = get_spark("pytest", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def engine(spark, sf_dir):
    from data_wrangler_spark import Engine

    return Engine(spark, sf_dir)


@pytest.fixture(scope="session")
def foobar(spark):
    """The reference's only fixture (testdb.sql:1-15), recreated to
    pin gateway semantics: foo(id,name), bar(id,foo_id,rank)."""
    foo = spark.createDataFrame(
        [(1, "bob"), (2, "fred"), (3, "jones")], "id int, name string"
    )
    bar = spark.createDataFrame(
        [(4, 1, 1), (5, 1, 2), (6, 2, 5)], "id int, foo_id int, rank int"
    )
    return foo, bar
