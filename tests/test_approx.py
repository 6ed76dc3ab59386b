"""Accuracy pins for the approximate aggregates.

Round 3: both queries now carry EXACT oracles — they return the exact
value plus a boolean asserting the sketch landed inside its contract
band, so the DuckDB harness hash-checks them. These tests pin the raw
sketch error independently (computing the approx values directly),
so the contract stays observable even though the query output only
exposes the boolean.
"""

from pyspark.sql import functions as F

from data_wrangler_spark import REGISTRY
from data_wrangler_spark.catalog import load_table


def test_approx_percentile_flags_true_and_close_to_exact(spark, sf_dir):
    rows = REGISTRY["q_agg_approx_percentile"].run(spark, sf_dir).collect()
    assert rows, "no groups returned"
    for r in rows:
        assert r.median_in_rank_band, f"{r.l_returnflag}: median outside rank band"
        assert r.p90_in_rank_band, f"{r.l_returnflag}: p90 outside rank band"

    # Independent raw-error pin: GK estimate within 5% of exact value.
    li = load_table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("med"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("med_a"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("p90_a"),
    )
    for r in both.collect():
        assert abs(r.med_a - r.med) / max(r.med, 1) <= 0.05
        assert abs(r.p90_a - r.p90) / max(r.p90, 1) <= 0.05


def test_approx_distinct_flags_true_and_within_rsd(spark, sf_dir):
    rows = REGISTRY["q_agg_approx_distinct"].run(spark, sf_dir).collect()
    assert rows, "no groups returned"
    for r in rows:
        assert r.approx_within_bound, f"{r.o_orderstatus}: HLL outside 5*rsd"

    # Independent raw-error pin: HLL estimate within 5*rsd of exact.
    o = load_table(spark, sf_dir, "orders")
    both = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_a"),
    )
    for r in both.collect():
        rel_err = abs(r.n_a - r.n) / max(r.n, 1)
        assert rel_err <= 5 * 0.02, f"{r.o_orderstatus}: {r.n_a} vs {r.n}"


def test_bitmap_distinct_uses_bitmap_aggregates(spark, sf_dir):
    """The plan must actually run the bitmap path (construct/count in
    the aggregate expressions), and match count_distinct exactly."""
    from pyspark.sql import functions as F

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.registry import REGISTRY

    df = REGISTRY["q_bitmap_distinct"].run(spark, sf_dir)
    plan = df._jdf.queryExecution().toString().lower()
    assert "bitmap_construct_agg" in plan and "bitmap_count" in plan

    expect = {
        r.o_orderstatus: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    got = {r.o_orderstatus: r.n_customers for r in df.collect()}
    assert got == expect
