"""Sketch-operator invariants (sketches.py). Exact values are pinned
by the DuckDB oracle harness; these pin the defining mathematical
properties of each structure."""

from data_wrangler_spark.registry import REGISTRY


def test_cms_never_underestimates(spark, sf_dir):
    rows = REGISTRY["q_sketch_cms"].run(spark, sf_dir).collect()
    assert rows, "heavy hitters exist at every sf"
    for r in rows:
        assert r.cms_estimate >= r.true_count  # CMS one-sided error
        assert r.overestimate == r.cms_estimate - r.true_count
    # sketch is useful, not saturated: median overestimate stays small
    over = sorted(r.overestimate / r.true_count for r in rows)
    assert over[len(over) // 2] < 1.0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    rows = REGISTRY["q_bloom_join"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every true match passes the bloom ⟺ pass = true + false_pos
        assert r.n_bloom_pass == r.n_true_match + r.n_false_pos
        assert 0 <= r.n_false_pos <= r.n_orders - r.n_true_match
