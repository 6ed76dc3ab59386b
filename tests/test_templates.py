"""SQL-template catalog semantics pinned to the reference gateway:
positional ?-binding, named params, identifier validation, missing-
param errors (index.js:264-325, lib/examiner.js:162-208)."""

import pytest

from pyspark.sql import functions as F

from data_wrangler_spark.catalog import Catalog, UnknownIdentifierError
from data_wrangler_spark.plans.templates import MissingParameterError, SQLTemplates


@pytest.fixture(scope="module")
def templates(spark, sf_dir):
    reg = SQLTemplates(Catalog(spark, sf_dir))
    reg.register(
        "ordersByPriority", "SELECT * FROM orders WHERE o_orderpriority = ?"
    )
    reg.register(
        "lineitemsByOrder",
        "SELECT * FROM lineitem WHERE l_orderkey = ? AND l_quantity >= :minqty",
    )
    reg.register(
        "anyById",
        "SELECT * FROM IDENTIFIER(:tbl) WHERE IDENTIFIER(:pk) = :id",
    )
    reg.register("literalQ", "SELECT * FROM part WHERE p_name LIKE '%?%'")
    return reg


def test_positional_binding(spark, templates, sf_dir):
    df = templates.run(spark, "ordersByPriority", "1-URGENT")
    got = df.select(F.countDistinct("o_orderpriority")).collect()[0][0]
    assert got == 1


def test_mixed_positional_named(spark, templates):
    ok = templates.get("lineitemsByOrder")
    assert ok.n_positional == 1 and ok.named_params == ("minqty",)
    df = templates.run(spark, "lineitemsByOrder", 1, minqty=10)
    rows = df.collect()
    assert all(r.l_orderkey == 1 and r.l_quantity >= 10 for r in rows)


def test_missing_positional_errors(spark, templates):
    with pytest.raises(MissingParameterError, match="expected 1 positional"):
        templates.run(spark, "ordersByPriority")


def test_missing_named_errors(spark, templates):
    with pytest.raises(MissingParameterError, match="minqty"):
        templates.run(spark, "lineitemsByOrder", 1)


def test_identifier_params_validated(spark, templates):
    df = templates.run(spark, "anyById", tbl="customer", pk="c_custkey", id=3)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].c_custkey == 3
    with pytest.raises(UnknownIdentifierError):
        templates.run(spark, "anyById", tbl="pg_tables; --", pk="c_custkey", id=3)
    with pytest.raises(UnknownIdentifierError):
        templates.run(spark, "anyById", tbl="customer", pk="no_col", id=3)


def test_value_injection_is_inert(spark, templates):
    """A hostile value binds as a literal: no rows, no error — the
    upgrade over the reference's regex veto."""
    df = templates.run(spark, "ordersByPriority", "' OR '1'='1")
    assert df.count() == 0


def test_qmark_inside_literal_not_a_slot(spark, templates):
    tpl = templates.get("literalQ")
    assert tpl.n_positional == 0
    assert templates.run(spark, "literalQ").count() == 0
