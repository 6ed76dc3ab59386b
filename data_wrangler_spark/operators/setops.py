"""Set-operation extensions (SURVEY.md §2.4 "Set operations").

The reference has none. UNION [ALL] / INTERSECT / EXCEPT over
conformed projections. Scale notes: UNION ALL is a zero-shuffle
concatenation; the distinct variants shuffle on the full row — at
100 TB prefer pre-aggregated keys (as these queries do: they operate
on small key projections, not whole rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.registry import register


def _nations_of(spark: SparkSession, sf_dir: str, table: str, col: str) -> DataFrame:
    return load_table(spark, sf_dir, table).select(F.col(col).alias("nationkey"))


@register(
    "q_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("ext", "setop"),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys.
    unionByName + dropDuplicates ≡ SQL UNION."""
    c = _nations_of(spark, sf_dir, "customer", "c_nationkey")
    s = _nations_of(spark, sf_dir, "supplier", "s_nationkey")
    return c.unionByName(s).dropDuplicates()


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("ext", "setop"),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations present in both customer and supplier bases."""
    c = _nations_of(spark, sf_dir, "customer", "c_nationkey")
    s = _nations_of(spark, sf_dir, "supplier", "s_nationkey")
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("ext", "setop"),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers who never placed an urgent order
    (distinct set difference; `exceptAll` is the bag variant).
    Non-empty at every scale factor."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@register(
    "q_setops_all",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
    sn AS (SELECT s_nationkey AS nationkey FROM supplier),
    ia AS (SELECT nationkey FROM cn INTERSECT ALL SELECT nationkey FROM sn),
    ea AS (SELECT nationkey FROM cn EXCEPT ALL SELECT nationkey FROM sn)
    SELECT 'intersect_all' AS op, nationkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ia GROUP BY 2
    UNION ALL
    SELECT 'except_all', nationkey, CAST(COUNT(*) AS BIGINT)
    FROM ea GROUP BY 2
    """,
    tags=("ext", "setop"),
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — the ALL variants the distinct
    queries beside them do not exercise: INTERSECT ALL keeps
    min(countA, countB) copies per value, EXCEPT ALL keeps
    max(countA - countB, 0) — bag semantics, where a value can
    survive EXCEPT ALL while also appearing in INTERSECT ALL. The
    result re-aggregates the surviving multiplicities per value so
    the multiset cardinalities themselves are hash-checked.

    Scale: Spark plans both as a single hash-partitioned count
    comparison per value (no row-by-row matching) — the same one
    shuffle the DISTINCT variants pay, carrying counts instead of
    existence bits."""
    cn = _nations_of(spark, sf_dir, "customer", "c_nationkey")
    sn = _nations_of(spark, sf_dir, "supplier", "s_nationkey")
    ia = (
        cn.intersectAll(sn)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        cn.exceptAll(sn)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionAll(ea)
