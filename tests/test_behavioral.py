"""Behavioral-operator invariants (behavioral.py). Exact values are
pinned by the DuckDB oracles; these pin the semantics."""

from data_wrangler_spark.registry import REGISTRY


def test_funnel_steps_strictly_ordered(spark, sf_dir):
    rows = REGISTRY["q_funnel"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.stage == "purchase":
            assert r.t_view < r.t_click < r.t_purchase
        elif r.stage == "click":
            assert r.t_view < r.t_click and r.t_purchase is None
        else:
            assert r.stage == "view" and r.t_click is None and r.t_purchase is None


def test_retention_offset0_is_full_cohort(spark, sf_dir):
    rows = REGISTRY["q_retention_cohort"].run(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets  # every user is active in their own first week
        assert all(n <= offsets[0] for n in offsets.values())


def test_sessions_respect_gap(spark, sf_dir):
    from data_wrangler_spark.operators.behavioral import SESSION_GAP_SEC

    rows = REGISTRY["q_sessionize"].run(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert r.session_start <= r.session_end and r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r.sess_no)
        for prev, nxt in zip(sess, sess[1:]):
            gap = (nxt.session_start - prev.session_end).total_seconds()
            assert gap > SESSION_GAP_SEC  # sessions split only at real gaps


def test_corr_bounded(spark, sf_dir):
    rows = REGISTRY["q_agg_corr"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
        assert r.n > 0


def test_funnel_ttc_positive_ordered(spark, sf_dir):
    r = REGISTRY["q_funnel_ttc"].run(spark, sf_dir).collect()[0]
    assert r.n_converted > 0
    assert 0 < r.min_sec <= r.p50_sec <= r.p90_sec <= r.max_sec


def test_markov_rows_are_distributions(spark, sf_dir):
    rows = REGISTRY["q_markov_transitions"].run(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        assert 0 < r.p <= 1
        by_from[r.from_type] += r.p
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-9


def test_attribution_credits_full_purchase_mass(spark, sf_dir):
    """Every purchase is attributed exactly once: attributed counts
    sum to the corpus purchase count, and first_type values are real
    event types."""
    from pyspark.sql import functions as F

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_attribution"].run(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purch
    types = {r.event_type for r in ev.select("event_type").distinct().collect()}
    assert {r.first_type for r in rows} <= types


def test_dedup_temporal_matches_python_replay(spark, sf_dir):
    """Recompute the debounce decision in plain Python from the raw
    events and compare the kept set exactly — pins the sliding
    semantics (every event compares to its RAW predecessor, not the
    last survivor)."""
    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.operators.behavioral import DEBOUNCE_WINDOW_SEC

    raw = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    )
    by_key = {}
    for r in raw:
        by_key.setdefault((r.user_id, r.event_type), []).append(r)
    expected = set()
    for key, evs in by_key.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        prev_sec = None
        for r in evs:
            # ts is naive UTC (timestamp_ntz); pin the zone so the
            # replay doesn't depend on the host's local timezone
            from datetime import timezone

            sec = int(r.ts.replace(tzinfo=timezone.utc).timestamp())
            if prev_sec is None or sec - prev_sec > DEBOUNCE_WINDOW_SEC:
                expected.add(r.event_id)
            prev_sec = sec  # raw predecessor, kept or not

    kept = {
        r.event_id
        for r in REGISTRY["q_dedup_temporal"].run(spark, sf_dir).collect()
    }
    assert kept == expected
    assert 0 < len(kept) < len(raw)  # the fixture has real duplicates


def test_dedup_temporal_survivors_spaced(spark, sf_dir):
    """Consecutive KEPT events per (user, type) are always more than
    the window apart: k2's raw predecessor p satisfies k2-p > W and
    p >= k1, so k2-k1 > W."""
    from data_wrangler_spark.operators.behavioral import DEBOUNCE_WINDOW_SEC

    rows = REGISTRY["q_dedup_temporal"].run(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.user_id, r.event_type), []).append(r.ts)
    for ts_list in by_key.values():
        ts_list.sort()
        for a, b in zip(ts_list, ts_list[1:]):
            assert (b - a).total_seconds() > DEBOUNCE_WINDOW_SEC
