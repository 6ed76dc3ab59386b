"""The reference's own query catalog, reproduced 1:1 as templates.

Every named query the reference ships in its config
(`/root/reference/config.json:19-24,33-38,57-58`) re-registered over
the driver schema, so a user of the reference can run the same
catalog unchanged in spirit:

| reference (db.query)      | template here          | mapping |
|---------------------------|------------------------|---------|
| test.invoicesByDate       | test.invoicesByDate    | invoices→orders, date→o_orderdate |
| test.lineItems            | test.lineItems         | line_items→lineitem, invoice_id→l_orderkey |
| test.anyById              | test.anyById           | $relation + id → validated IDENTIFIER params |
| otherdb.descTable         | otherdb.descTable      | `desc $table` → DESCRIBE IDENTIFIER(:table) |
| otherdb.ticketAnswers     | otherdb.ticketAnswers  | ticket→orders, answer→lineitem |
| otherdb.freeForm          | otherdb.freeForm       | $x/$y/$z identifiers + '$q' value |
| otherdb.anyByField        | otherdb.anyByField     | $relation/$field identifiers |
| salesforce.accounts       | salesforce.accounts    | account→supplier (id, accountnumber→s_name, name) |

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
        "invoicesByDate",
        "SELECT * FROM orders WHERE o_orderdate = ?",
        doc="config.json:20 — select * from invoices where date = ?",
        db="test",
    )
    reg.register(
        "lineItems",
        "SELECT * FROM lineitem WHERE l_orderkey = ?",
        doc="config.json:21 — select * from line_items where invoice_id = ?",
        db="test",
    )
    reg.register(
        "anyById",
        "SELECT * FROM IDENTIFIER(:relation) WHERE IDENTIFIER(:pk) = :id",
        doc="config.json:22 — select * from $relation where id = ? "
        "(our schema has per-table pk names, so the pk is a second "
        "validated identifier)",
        db="test",
    )
    reg.register(
        "descTable",
        "DESCRIBE TABLE IDENTIFIER(:table)",
        doc="config.json:34 — desc $table",
        db="otherdb",
    )
    reg.register(
        "ticketAnswers",
        "SELECT t.o_orderkey, a.* FROM orders t "
        "INNER JOIN lineitem a ON (t.o_orderkey = a.l_orderkey) "
        "WHERE t.o_orderkey = ?",
        doc="config.json:36 — select t.id, a.* from ticket t inner join "
        "answer a on (t.id = a.ticket_id) where t.id = ?",
        db="otherdb",
    )
    reg.register(
        "freeForm",
        "SELECT IDENTIFIER(:x) FROM IDENTIFIER(:y) WHERE IDENTIFIER(:z) = :q",
        doc="config.json:23 — select $x from $y where $z = '$q'",
        db="otherdb",
    )
    reg.register(
        "anyByField",
        "SELECT * FROM IDENTIFIER(:relation) WHERE IDENTIFIER(:field) = ?",
        doc="config.json:37 — select * from $relation where $field = ?",
        db="otherdb",
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
        "identifier, as in test.anyById)",
        db="salesforce",
    )
    return reg
