"""UDF / UDAF / UDTF surface (SURVEY.md §2.4 "UDF/UDAF/UDTF").

The reference's extension surface is its plugin loader
(`require('./plugins/' + pname)`, index.js:140-157). The Spark-native
equivalent is the three Python extension points, each used the
scale-correct way:

- scalar: `@pandas_udf` — Arrow-batched, vectorized (10-100× the
  row-at-a-time Python UDF; never use F.udf in a hot path);
- aggregate: grouped-agg `@pandas_udf` — partial aggregation per
  group partition, Arrow transfer of group slices;
- table: `GroupedData.applyInPandas` — per-group pandas frame in/out.

Floating-point note: the UDAF sums l_quantity, whose values are small
integers stored as double — integer-valued double addition is exact
in any order, so the pandas sum matches the SQL oracle bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.registry import register


def _price_band_udf():
    # pandas_udf parses its DDL return type against the active session,
    # so UDFs are built lazily inside each query builder.
    @pandas_udf("string")
    def price_band(total: pd.Series) -> pd.Series:
        return pd.cut(
            total,
            bins=[float("-inf"), 50_000.0, 150_000.0, float("inf")],
            labels=["low", "mid", "high"],
        ).astype(str)

    return price_band


@register(
    "q_udf_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice <= 50000 THEN 'low'
                WHEN o_totalprice <= 150000 THEN 'mid'
                ELSE 'high' END AS band
    FROM orders
    """,
    tags=("ext", "udx"),
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF; oracle is the equivalent CASE
    expression. (In production this exact function should BE the CASE
    expression — the UDF exists to pin the extension surface.)"""
    o = load_table(spark, sf_dir, "orders")
    band = _price_band_udf()
    return o.select("o_orderkey", "o_totalprice", band("o_totalprice").alias("band"))


def _qty_udafs():
    @pandas_udf("double")
    def qty_sum_udaf(qty: pd.Series) -> float:
        return float(qty.sum())

    @pandas_udf("double")
    def qty_max_udaf(qty: pd.Series) -> float:
        return float(qty.max())

    # Spark disallows mixing group-agg pandas UDFs with non-pandas
    # aggregates in one agg() — count is a pandas UDAF here too.
    @pandas_udf("long")
    def count_udaf(qty: pd.Series) -> int:
        return len(qty)

    return qty_sum_udaf, qty_max_udaf, count_udaf


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           SUM(l_quantity) AS total_qty,
           MAX(l_quantity) AS max_qty,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ext", "udx"),
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF) next to a built-in count;
    exact because l_quantity is integer-valued."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_sum_udaf, qty_max_udaf, count_udaf = _qty_udafs()
    return li.groupBy("l_returnflag").agg(
        qty_sum_udaf("l_quantity").alias("total_qty"),
        qty_max_udaf("l_quantity").alias("max_qty"),
        count_udaf("l_quantity").alias("n_items"),
    )


def _top2_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map body: top-2 orders by price, pk tiebreak."""
    out = pdf.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(2)
    out = out.copy()
    out["rank_in_priority"] = range(1, len(out) + 1)
    return out


@register(
    "q_udtf_apply",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
           CAST(rn AS INT) AS rank_in_priority
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
    """,
    tags=("ext", "udx"),
)
def q_udtf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped grouped map via applyInPandas: top-2 orders per
    priority class. Deterministic (total order inside each group), so
    it gets a real SQL oracle — the window-function formulation the
    optimizer would prefer. applyInPandas shuffles on the group key;
    group cardinality (5 priorities) bounds parallelism, which is why
    the built-in window form is the scale path."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
        "o_orderpriority string, rank_in_priority int"
    )
    return o.groupBy("o_orderpriority").applyInPandas(_top2_per_group, schema)
