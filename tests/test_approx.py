"""Error-bound pin for the HLL approximate distinct count — the
oracle harness records it rows-only, so the accuracy contract lives
here: within 5×rsd of the exact count per group."""

from pyspark.sql import functions as F

from data_wrangler_spark import REGISTRY
from data_wrangler_spark.catalog import load_table


def test_approx_percentile_close_to_exact(spark, sf_dir):
    exact = {
        r.l_returnflag: (r.median_qty, r.p90_price)
        for r in REGISTRY["q_agg_percentile"].run(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: (r.median_qty_approx, r.p90_price_approx)
        for r in REGISTRY["q_agg_approx_percentile"].run(spark, sf_dir).collect()
    }
    for flag, (med, p90) in exact.items():
        amed, ap90 = approx[flag]
        assert abs(amed - med) / max(med, 1) <= 0.05
        assert abs(ap90 - p90) / max(p90, 1) <= 0.05


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
