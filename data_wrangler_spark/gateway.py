"""The reference's own query catalog, reproduced 1:1 as templates.

Every named query the reference ships in its config — under its
LITERAL database name and query key
(`/root/reference/config.json:13-38,57-58`) — re-registered over the
driver schema, so a reference user's URLs resolve unchanged:
`/q/billing/invoices/2014-10-01`, `/q/support/ticket/7`, …

| reference (db.query)          | runs here as | mapping |
|-------------------------------|--------------|---------|
| billing.invoices              | itself       | invoices→orders, date→o_orderdate |
| billing.lineitems             | itself       | line_items→lineitem, invoice_id→l_orderkey |
| billing.anyById               | itself       | $table + id → validated IDENTIFIER params |
| billing.getXfromYwhereZisQ    | itself       | $x/$y/$z identifiers + '$q' value |
| support.descTable             | itself       | `desc $table` → DESCRIBE IDENTIFIER(:table) |
| support.ticket                | itself       | ticket→orders point lookup |
| support.ticketAnswers         | itself       | ticket→orders, answer→lineitem |
| support.getStuff              | itself       | $relation/$field identifiers |
| salesforce.accounts           | itself       | account→supplier (id, accountnumber→s_name, name) |
| salesforce.fromwhat           | itself       | select id from $what |

The rounds-1–6 names (`test.invoicesByDate`, `otherdb.freeForm`, …)
stay registered as ALIASES of the same template objects, so both
spellings run the identical plan and bare-name lookup stays
unambiguous.

Query names are scoped per source database exactly as the reference
scopes its per-db query maps (`config.json:19-24` vs `:33-38`;
`index.js:57,113`): two backends may define the same query name
without collision, and bare names remain usable when unambiguous.
TABLE namespaces still collapse into one Spark catalog (SURVEY §1.5):
federation is a table-name concern, not an engine concern.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from data_wrangler_spark.catalog import Catalog
from data_wrangler_spark.plans.templates import SQLTemplates


def reference_catalog(spark: SparkSession, sf_dir: str) -> SQLTemplates:
    reg = SQLTemplates(Catalog(spark, sf_dir))
    reg.register(
        "invoices",
        "SELECT * FROM orders WHERE o_orderdate = ?",
        doc="config.json:20 — select * from invoices where date = ?",
        db="billing",
    )
    reg.register(
        "lineitems",
        "SELECT * FROM lineitem WHERE l_orderkey = ?",
        doc="config.json:21 — select * from line_items where invoice_id = ?",
        db="billing",
    )
    reg.register(
        "anyById",
        "SELECT * FROM IDENTIFIER(:relation) WHERE IDENTIFIER(:pk) = :id",
        doc="config.json:22 — select * from $table where id = ? "
        "(our schema has per-table pk names, so the pk is a second "
        "validated identifier)",
        db="billing",
    )
    reg.register(
        "getXfromYwhereZisQ",
        "SELECT IDENTIFIER(:x) FROM IDENTIFIER(:y) WHERE IDENTIFIER(:z) = :q",
        doc="config.json:23 — select $x from $y where $z = '$q'",
        db="billing",
    )
    reg.register(
        "descTable",
        "DESCRIBE TABLE IDENTIFIER(:table)",
        doc="config.json:34 — desc $table",
        db="support",
    )
    reg.register(
        "ticket",
        "SELECT * FROM orders WHERE o_orderkey = ?",
        doc="config.json:35 — select * from ticket where id = ? "
        "(ticket→orders, the same fixture mapping ticketAnswers uses)",
        db="support",
    )
    reg.register(
        "ticketAnswers",
        "SELECT t.o_orderkey, a.* FROM orders t "
        "INNER JOIN lineitem a ON (t.o_orderkey = a.l_orderkey) "
        "WHERE t.o_orderkey = ?",
        doc="config.json:36 — select t.id, a.* from ticket t inner join "
        "answer a on (t.id = a.ticket_id) where t.id = ?",
        db="support",
    )
    reg.register(
        "getStuff",
        "SELECT * FROM IDENTIFIER(:relation) WHERE IDENTIFIER(:field) = ?",
        doc="config.json:37 — select * from $relation where $field = ?",
        db="support",
    )
    reg.register(
        "accounts",
        "SELECT s_suppkey AS id, s_name AS accountnumber, s_name AS name FROM supplier",
        doc="config.json:57 — select id, accountnumber, name from account",
        db="salesforce",
    )
    reg.register(
        "fromwhat",
        "SELECT IDENTIFIER(:pk) AS id FROM IDENTIFIER(:what)",
        doc="config.json:58 — select id from $what (our schema has "
        "per-table pk names, so the pk is a second validated "
        "identifier, as in billing.anyById)",
        db="salesforce",
    )
    # rounds-1–6 spellings, kept as aliases of the same templates
    reg.alias("invoicesByDate", "billing.invoices", db="test")
    reg.alias("lineItems", "billing.lineitems", db="test")
    reg.alias("anyById", "billing.anyById", db="test")
    reg.alias("descTable", "support.descTable", db="otherdb")
    reg.alias("ticketAnswers", "support.ticketAnswers", db="otherdb")
    reg.alias("freeForm", "billing.getXfromYwhereZisQ", db="otherdb")
    reg.alias("anyByField", "support.getStuff", db="otherdb")
    return reg
