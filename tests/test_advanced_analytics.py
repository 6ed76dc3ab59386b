"""Invariants for the range-window / stats / stream-join batch.
Exact values are pinned by the DuckDB oracles; these pin semantics."""

from collections import defaultdict

from data_wrangler_spark.registry import REGISTRY


def test_range_window_counts_by_day_distance(spark, sf_dir):
    rows = REGISTRY["q_window_range_7d"].run(spark, sf_dir).collect()
    assert rows
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.o_custkey].append(r)
    checked = 0
    for cust, rs in list(by_cust.items())[:50]:
        days = [r.day_no for r in rs]
        for r in rs:
            expect = sum(1 for d in days if r.day_no - 6 <= d <= r.day_no)
            assert r.n_orders_7d == expect
            checked += 1
    assert checked


def test_pct_of_total_sums_to_one(spark, sf_dir):
    rows = REGISTRY["q_pct_of_total"].run(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.pct_of_total for r in rows) - 1.0) < 1e-9
    assert all(0 < r.pct_of_total < 1 for r in rows)


def test_cum_users_monotone_and_totals(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_cum_users"].run(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    running = 0
    for r in rows:
        running += r.new_users
        assert r.cum_users == running
    from data_wrangler_spark.catalog import load_table

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert rows[-1].cum_users == n_users


def test_chi2_nonnegative_with_grid_dof(spark, sf_dir):
    r = REGISTRY["q_chi2_independence"].run(spark, sf_dir).collect()[0]
    assert r.chi2 >= 0
    assert r.dof >= 1
    assert r.n > 0


def test_regex_tokens_match_pattern(spark, sf_dir):
    import re

    rows = REGISTRY["q_regex_extract"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert re.fullmatch(r"[a-z]{5,}", r.token)
        assert r.n >= 10


def test_stream_join_within_interval(spark, sf_dir):
    rows = REGISTRY["q_stream_join"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        delta = (r.purchase_ts - r.view_ts).total_seconds()
        assert 0 <= delta <= 1800


def test_bpe_encode_consistent_with_merges(spark, sf_dir):
    """Encoding must use exactly the rules q_bpe_merges learns: the
    chosen stage-0/1 pairs imply the corpus-level compression —
    n_symbols_bpe = n_chars_raw - (merge hits), and every doc
    compresses or stays equal, never grows."""
    from data_wrangler_spark.registry import REGISTRY

    enc = REGISTRY["q_bpe_encode"].run(spark, sf_dir).collect()
    assert enc
    for r in enc:
        assert 0 < r.n_symbols_bpe <= r.n_chars_raw
        assert 0 < r.compression_micro <= 1000000
    from data_wrangler_spark.operators.text_analysis import BPE_ROUNDS

    merges = REGISTRY["q_bpe_merges"].run(spark, sf_dir).collect()
    chosen = [r for r in merges if r.chosen]
    assert len(chosen) == BPE_ROUNDS
    # total symbols removed across the corpus = hits of all K merges
    removed = sum(r.n_chars_raw - r.n_symbols_bpe for r in enc)
    assert removed >= sum(1 for r in chosen)  # every rule fired


def test_dp_count_noise_symmetric_and_bounded(spark, sf_dir):
    """Seeded Laplace noise: deterministic across runs, zero-mean-ish
    by construction (symmetric CDF inversion), and the released count
    equals true + noise exactly in micro-units."""
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_dp_count"].run(spark, sf_dir).collect()
    again = REGISTRY["q_dp_count"].run(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    for r in rows:
        assert r.n_dp_micro == r.n_true * 1000000 + r.noise_micro
        # ε=1 Laplace: |noise| beyond 15 (≈ e^-15 tail) would signal
        # a broken inverse-CDF
        assert abs(r.noise_micro) < 15_000_000


def test_recursive_hierarchy_depth_is_digit_count(spark, sf_dir):
    """depth(k) = digits(k) - 1 and root = leading digit — the whole
    traversal is checkable in closed form."""
    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_recursive_hierarchy"].run(spark, sf_dir).collect()
    keys = [
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    ]
    expect = {}
    for k in keys:
        s = str(k)
        expect.setdefault((len(s) - 1, int(s[0])), 0)
        expect[(len(s) - 1, int(s[0]))] += 1
    got = {(r.depth, r.root): r.n_customers for r in rows}
    assert got == expect


def test_join_interval_overlap_semantics(spark, sf_dir):
    """Bin decomposition sanity beyond the oracle hash: every output
    row's overlap length is positive and bounded by both the window
    length and the activity interval; n_incidents >= 1."""
    from data_wrangler_spark.operators.joins import INCIDENT_SECS
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_join_interval"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_incidents >= 1
        assert 0 <= r.overlap_secs <= r.n_incidents * min(
            INCIDENT_SECS, r.a_end - r.a_start or INCIDENT_SECS
        )


def test_asof_tolerance_is_filtered_asof(spark, sf_dir):
    """The tolerance as-of must agree with the plain as-of wherever
    it matches, reject exactly the matches staler than the bound,
    and never fall back to an older error once the nearest one is
    out of tolerance."""
    from data_wrangler_spark.operators.relational_extras import ASOF_TOL_US
    from data_wrangler_spark.registry import REGISTRY

    tol = {
        r.event_id: r
        for r in REGISTRY["q_join_asof_tolerance"].run(spark, sf_dir).collect()
    }
    plain = {
        r.event_id: r.last_error_ts
        for r in REGISTRY["q_join_asof"].run(spark, sf_dir).collect()
    }
    assert set(tol) == set(plain)
    n_kept = n_rejected = 0
    for eid, r in tol.items():
        if r.last_error_ts is not None:
            assert r.last_error_ts == plain[eid]
            assert 0 <= r.stale_us <= ASOF_TOL_US
            n_kept += 1
        else:
            assert r.stale_us is None
            if plain[eid] is not None:
                # the nearest match existed but was too stale
                stale = (r.ts - plain[eid]).total_seconds() * 1_000_000
                assert stale > ASOF_TOL_US
                n_rejected += 1
    assert n_kept and n_rejected, "fixture should split on the bound"
