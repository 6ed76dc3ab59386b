"""Engine facade: the user-facing API of the analytics layer.

The reference exposed its catalog as HTTP routes
(`/root/reference/index.js:264-325`) with a self-description endpoint
(`index.js:371-425`). Here the same surface is a Python object:

    eng = Engine(spark, "/root/testdata/sf0.01")
    eng.names()                      # registered query names
    eng.run("q_inner_join")          # -> DataFrame
    eng.run("q_point_lookup", key=7) # parameterized
    eng.describe("q_inner_join")     # -> StructType (vs. the reference's
                                     #    regex field-name inference,
                                     #    lib/examiner.js:139-160)
    eng.list_records("customer", page=2, perpage=50, sortby="c_name")
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from data_wrangler_spark import registry
from data_wrangler_spark.catalog import Catalog
from data_wrangler_spark.plans.pagination import paginate
from data_wrangler_spark.session import apply_runtime_confs


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = apply_runtime_confs(spark)
        self.sf_dir = sf_dir
        self.catalog = Catalog(spark, sf_dir)

    def names(self) -> list[str]:
        return sorted(registry.REGISTRY)

    def run(self, name: str, **params: Any) -> DataFrame:
        spec = registry.REGISTRY[name]
        return spec.run(self.spark, self.sf_dir, **params)

    def describe(self, name: str) -> StructType:
        """Exact output schema from Catalyst analysis — replaces the
        reference's name-only regex inference (`examineQuery`)."""
        return self.run(name).schema

    def explain(self, name: str, **params: Any) -> str:
        """Formatted physical plan of a registered query — the
        introspection the reference cannot offer (it never sees a
        plan, only remote SQL text). Useful for checking pushdown /
        join strategy / exchange counts before running at scale."""
        df = self.run(name, **params)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def release_cache(self) -> int:
        """Unpersist every frame operator builders pinned (see
        functions/distributed.pin). Call after materializing results
        in a long-lived session so cached partitions from many
        queries don't accumulate; returns the number released."""
        from data_wrangler_spark.functions.distributed import release_pinned

        return release_pinned()

    def list_records(
        self,
        table: str,
        page: int = 1,
        perpage: int = 20,
        sortby: str | None = None,
    ) -> DataFrame:
        """Generic paged list — the `/db/:db/rel/:relation` analog
        (`/root/reference/index.js:431-492`) with the same clamps."""
        self.catalog.validate_table(table)
        if sortby is not None:
            self.catalog.validate_column(table, sortby)
        return paginate(self.catalog.table(table), table, page, perpage, sortby)

    def get_record(self, table: str, rec_id: str) -> DataFrame:
        """Point read by primary key — `getRecord`
        (`/root/reference/index.js:496-533`, `select * from %s where
        id = ?`). The id value is CAST to the pk column's type (never
        the column to string), so the comparison stays a pushed-down
        literal predicate: at 100 TB this prunes row groups on pk
        min/max stats instead of scanning. A value that cannot meet
        the type surfaces as an ANSI cast error for the caller to map
        to the invalid-parameter envelope."""
        from pyspark.sql import functions as F

        from data_wrangler_spark.catalog import PRIMARY_KEYS

        self.catalog.validate_table(table)
        tbl = self.catalog.table(table)
        pk = PRIMARY_KEYS[table]
        pk_type = dict(tbl.dtypes)[pk]
        return tbl.filter(F.col(pk) == F.lit(rec_id).cast(pk_type))

    def sub_records(self, parent: str, rec_id: str, child: str) -> DataFrame:
        """Children of one record via the FK convention —
        `getSubRecordList` (`index.js:536-585`, `select * from %s
        where %s_id = ?`). The reference derives the FK by naming
        convention; this schema prefixes columns per table, so the
        declared FK_CONVENTIONS map is the authority — an undeclared
        (parent, child) pair is a KeyError, not a guessed column.
        Same pushdown-preserving literal cast as get_record."""
        from pyspark.sql import functions as F

        from data_wrangler_spark.catalog import FK_CONVENTIONS, PRIMARY_KEYS

        self.catalog.validate_table(parent)
        self.catalog.validate_table(child)
        fk = FK_CONVENTIONS.get((parent, child))
        if fk is None:
            raise KeyError(f"no FK relationship {parent!r} -> {child!r}")
        ctbl = self.catalog.table(child)
        pk_type = dict(self.catalog.table(parent).dtypes)[PRIMARY_KEYS[parent]]
        return ctbl.filter(F.col(fk) == F.lit(rec_id).cast(pk_type))
