"""Pin the 2-decimal-place money contract the cents-based window
sums rely on (ADVICE r4, operators/windows.py:190).

q_window_running_sum (and every other integer-cents rewrite of a
DECIMAL(22,6) oracle sum) is bit-identical to the oracle ONLY while
o_totalprice carries at most 2 decimal places; the oracle tolerates
up to 6. If a future fixture generation ever emits sub-cent values,
this test fails loudly instead of the query silently diverging.
"""

from pyspark.sql import functions as F


def _non_roundtrip_count(df, col):
    cents = F.floor(F.col(col) * 100 + 0.5).cast("long")
    return df.filter((cents.cast("double") / 100) != F.col(col)).count()


def test_orders_totalprice_is_2dp(spark, sf_dir):
    from data_wrangler_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    assert _non_roundtrip_count(orders, "o_totalprice") == 0


def test_lineitem_extendedprice_is_2dp(spark, sf_dir):
    from data_wrangler_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    assert _non_roundtrip_count(li, "l_extendedprice") == 0
