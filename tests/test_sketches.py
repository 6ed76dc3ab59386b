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


def test_kmv_matches_independent_python_replay(spark, sf_dir):
    """The k-th minimum hash and the estimate must equal a hashlib
    replay of the same 48-bit bottom-K construction, and both pinned
    invariants (band + merge) must hold."""
    import hashlib

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.operators.sketches import KMV_K, KMV_SPACE, q_sketch_kmv

    row = q_sketch_kmv(spark, sf_dir).collect()[0]

    vals = {
        r.l_orderkey
        for r in load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    }
    hashes = sorted(
        int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) for v in vals
    )
    hk = hashes[KMV_K - 1]
    assert row.kth_min_hash == hk
    assert row.est_distinct == (KMV_K - 1) * KMV_SPACE // hk
    assert row.exact_distinct == len(vals)
    assert row.within_band and row.merge_exact


def test_source_overlap_estimator_quality(spark, sf_dir):
    """Every source pair is covered exactly once, the KMV estimate
    stays a valid Jaccard micro-value, and on this fixture every
    estimate lands within the contract band of the exact audit."""
    from data_wrangler_spark.operators.sketches import OVERLAP_BAND_MICRO
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_source_overlap"].run(spark, sf_dir).collect()
    n_src = len({r.sa for r in rows} | {r.sb for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.sa < r.sb
        assert 0 <= r.jac_est_micro <= 1_000_000
        assert r.err_micro == abs(r.jac_est_micro - r.jac_micro)
        assert r.within_band == (r.err_micro <= OVERLAP_BAND_MICRO)
        assert r.within_band
    assert any(r.jac_micro > 0 for r in rows), "fixture has real overlap"
