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
