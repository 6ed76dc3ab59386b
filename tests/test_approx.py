"""Error-bound pin for the HLL approximate distinct count — the
oracle harness records it rows-only, so the accuracy contract lives
here: within 5×rsd of the exact count per group."""

from pyspark.sql import functions as F

from data_wrangler_spark import REGISTRY
from data_wrangler_spark.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.n_customers_approx
        for r in REGISTRY["q_agg_approx_distinct"].run(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, n in exact.items():
        rel_err = abs(approx[status] - n) / max(n, 1)
        assert rel_err <= 5 * 0.02, f"{status}: {approx[status]} vs {n}"
