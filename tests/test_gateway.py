"""The reference's config.json catalog running on this engine."""

import pytest

from pyspark.sql import functions as F

from data_wrangler_spark.gateway import reference_catalog


@pytest.fixture(scope="module")
def ref(spark, sf_dir):
    return reference_catalog(spark, sf_dir)


def test_all_reference_queries_registered(ref):
    assert ref.names() == sorted(
        [
            "invoicesByDate",
            "lineItems",
            "anyById",
            "descTable",
            "ticketAnswers",
            "freeForm",
            "anyByField",
            "accounts",
        ]
    )


def test_invoices_by_date(spark, ref, sf_dir):
    from data_wrangler_spark.catalog import load_table

    some_date = (
        load_table(spark, sf_dir, "orders").select(F.min("o_orderdate")).first()[0]
    )
    df = ref.run(spark, "invoicesByDate", some_date)
    assert df.count() >= 1


def test_line_items(spark, ref):
    assert ref.run(spark, "lineItems", 1).count() > 0


def test_ticket_answers_shape(spark, ref):
    df = ref.run(spark, "ticketAnswers", 1)
    # t.id plus all answer columns — the qualified-star shape
    assert df.columns[0] == "o_orderkey"
    assert "l_linenumber" in df.columns
    assert df.count() > 0


def test_any_by_id_and_field(spark, ref):
    row = ref.run(spark, "anyById", relation="part", pk="p_partkey", id=5).collect()
    assert len(row) == 1 and row[0].p_partkey == 5
    df = ref.run(spark, "anyByField", "AUTOMOBILE", relation="customer", field="c_mktsegment")
    assert df.select(F.countDistinct("c_mktsegment")).first()[0] == 1


def test_free_form(spark, ref):
    df = ref.run(spark, "freeForm", x="n_name", y="nation", z="n_regionkey", q=2)
    assert df.columns == ["n_name"] and df.count() > 0


def test_desc_table(spark, ref):
    rows = ref.run(spark, "descTable", table="region").collect()
    assert {r.col_name for r in rows} >= {"r_regionkey", "r_name"}


def test_accounts(spark, ref):
    df = ref.run(spark, "accounts")
    assert df.columns == ["id", "accountnumber", "name"]
