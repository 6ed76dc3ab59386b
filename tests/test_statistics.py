"""Invariants for statistics.py. Exact values are pinned by the
DuckDB oracles; these pin semantics."""

import math

from data_wrangler_spark.registry import REGISTRY


def test_mad_bounded_by_range(spark, sf_dir):
    rows = REGISTRY["q_mad"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mad_qty >= 0
        assert r.mad_qty <= r.median_qty  # quantities are positive
        assert r.n > 0


def test_entropy_bounds(spark, sf_dir):
    rows = REGISTRY["q_entropy"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 ≤ H ≤ ln(k), with quantization slack
        assert -1e-6 <= r.entropy <= math.log(r.n_langs) + 1e-6
        assert r.n_langs >= 1 and r.n_docs >= r.n_langs


def test_gini_in_unit_interval(spark, sf_dir):
    r = REGISTRY["q_gini"].run(spark, sf_dir).collect()[0]
    assert 0 <= r.gini < 1
    assert r.total_spend > 0
    assert r.n > 0


def test_ab_test_consistent_counts(spark, sf_dir):
    r = REGISTRY["q_ab_test"].run(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.c_a <= r.n_a and 0 <= r.c_b <= r.n_b
    assert 0 < r.rate_a < 1 and 0 < r.rate_b < 1  # non-degenerate arms
    # z sign follows the rate difference
    assert (r.z_stat > 0) == (r.rate_a > r.rate_b)


def test_pareto_shares_sum_to_one_and_decrease(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_pareto"].run(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert len(rows) == 10
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-9
    shares = [r.revenue_share for r in rows]
    assert shares == sorted(shares, reverse=True)  # decile 1 richest
    assert shares[0] > 0.1  # top decile over-indexes


def test_rfm_scores_are_quintiles(spark, sf_dir):
    rows = REGISTRY["q_rfm"].run(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, col) for r in rows]
        assert set(vals) == {1, 2, 3, 4, 5}
        # quintiles are balanced within one row
        from collections import Counter

        counts = Counter(vals)
        assert max(counts.values()) - min(counts.values()) <= 1
    best_m = [r for r in rows if r.m_score == 1]
    worst_m = [r for r in rows if r.m_score == 5]
    assert min(r.monetary for r in best_m) >= max(r.monetary for r in worst_m)


def test_skyline_is_exactly_the_nondominated_set(spark, sf_dir):
    """Brute-force check of the window-envelope rewrite: the result
    must equal the set of non-strictly-dominated (spend, orders)
    points computed in plain Python over the same aggregate."""
    from pyspark.sql import functions as F

    from data_wrangler_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    agg = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(22,6)"))
            .cast("double")
            .alias("x"),
            F.count("*").alias("y"),
        )
        .collect()
    )
    pts = [(r.c_custkey, r.x, r.y) for r in agg]
    expected = {
        k
        for k, x, y in pts
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for _, bx, by in pts
        )
    }
    got = {
        r.c_custkey
        for r in REGISTRY["q_skyline"].run(spark, sf_dir).collect()
    }
    assert got == expected


def test_benford_frequencies_sum_and_expectations(spark, sf_dir):
    """Digits 1-9 all present, observed frequencies sum to ~1, and
    the Benford expectations match log10(1+1/d) micro-floored."""
    import math

    rows = REGISTRY["q_benford"].run(spark, sf_dir).collect()
    assert {r.digit for r in rows} == set(range(1, 10))
    assert abs(sum(r.obs_micro for r in rows) - 1_000_000) < 10
    for r in rows:
        expect = math.log10(1 + 1 / r.digit) * 1_000_000
        assert abs(r.benford_micro - expect) <= 2


def test_k_anonymity_invariants_and_total(spark, sf_dir):
    """Per-type audit rows are internally consistent and the n_rows
    column partitions the full event count (exact values are pinned
    by the DuckDB oracle)."""
    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.operators.statistics import K_ANON

    rows = REGISTRY["q_k_anonymity"].run(spark, sf_dir).collect()
    assert rows
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert 1 <= r.min_group_size
        assert 0 <= r.n_small_groups <= r.n_groups
        assert 0 <= r.suppressed_rows <= r.n_rows
        # small groups hold fewer than K rows each
        assert r.suppressed_rows < K_ANON * (r.n_small_groups + 1)
        assert r.suppression_micro == r.suppressed_rows * 1_000_000 // r.n_rows
        if r.n_small_groups == 0:
            assert r.suppressed_rows == 0 and r.min_group_size >= K_ANON
