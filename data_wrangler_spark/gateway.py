"""The reference's own query catalog, reproduced 1:1 as templates.

Every named query the reference ships in its config
(`/root/reference/config.json:19-24,33-38,57-58`) re-registered over
the driver schema, so a user of the reference can run the same
catalog unchanged in spirit:

| reference (db.query)      | template here      | mapping |
|---------------------------|--------------------|---------|
| test.invoicesByDate       | invoicesByDate     | invoices→orders, date→o_orderdate |
| test.lineItems            | lineItems          | line_items→lineitem, invoice_id→l_orderkey |
| test.anyById              | anyById            | $relation + id → validated IDENTIFIER params |
| otherdb.descTable         | descTable          | `desc $table` → DESCRIBE IDENTIFIER(:table) |
| otherdb.ticketAnswers     | ticketAnswers      | ticket→orders, answer→lineitem |
| otherdb.freeForm          | freeForm           | $x/$y/$z identifiers + '$q' value |
| otherdb.anyByField        | anyByField         | $relation/$field identifiers |
| salesforce.accounts       | accounts           | account→supplier (id, accountnumber→s_name, name) |

The reference's multi-database namespaces collapse into one Spark
catalog (SURVEY §1.5): federation is a table-name concern, not an
engine concern.
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
    )
    reg.register(
        "lineItems",
        "SELECT * FROM lineitem WHERE l_orderkey = ?",
        doc="config.json:21 — select * from line_items where invoice_id = ?",
    )
    reg.register(
        "anyById",
        "SELECT * FROM IDENTIFIER(:relation) WHERE IDENTIFIER(:pk) = :id",
        doc="config.json:22 — select * from $relation where id = ? "
        "(our schema has per-table pk names, so the pk is a second "
        "validated identifier)",
    )
    reg.register(
        "descTable",
        "DESCRIBE TABLE IDENTIFIER(:table)",
        doc="config.json:34 — desc $table",
    )
    reg.register(
        "ticketAnswers",
        "SELECT t.o_orderkey, a.* FROM orders t "
        "INNER JOIN lineitem a ON (t.o_orderkey = a.l_orderkey) "
        "WHERE t.o_orderkey = ?",
        doc="config.json:36 — select t.id, a.* from ticket t inner join "
        "answer a on (t.id = a.ticket_id) where t.id = ?",
    )
    reg.register(
        "freeForm",
        "SELECT IDENTIFIER(:x) FROM IDENTIFIER(:y) WHERE IDENTIFIER(:z) = :q",
        doc="config.json:23 — select $x from $y where $z = '$q'",
    )
    reg.register(
        "anyByField",
        "SELECT * FROM IDENTIFIER(:relation) WHERE IDENTIFIER(:field) = ?",
        doc="config.json:37 — select * from $relation where $field = ?",
    )
    reg.register(
        "accounts",
        "SELECT s_suppkey AS id, s_name AS accountnumber, s_name AS name FROM supplier",
        doc="config.json:57 — select id, accountnumber, name from account",
    )
    return reg
