"""Salted-join equivalence: same result as the plain join, spread
over n_salts × more tasks on the hot key."""

from pyspark.sql import functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.plans.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    plain = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_name"
    )
    salted = salted_join(
        li,
        part,
        "l_partkey",
        "p_partkey",
        salt_cols=["l_orderkey", "l_linenumber"],
        n_salts=4,
    ).select("l_orderkey", "l_linenumber", "p_name")

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    out = salted_join(
        n, s, "n_nationkey", "s_nationkey", salt_cols=["n_nationkey"], n_salts=4,
        how="left",
    )
    # every nation appears; nations without suppliers carry nulls
    assert out.select("n_nationkey").distinct().count() == n.count()
