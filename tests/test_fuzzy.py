"""Structural pins for the fuzzy-matching operators (the oracle
harness already checks exact values; these hold the blocking and
threshold invariants that make the operators scale)."""

from pyspark.sql import functions as F

from data_wrangler_spark import REGISTRY


def test_fuzzy_join_edit_invariants(spark, sf_dir):
    rows = REGISTRY["q_fuzzy_join_edit"].run(spark, sf_dir).collect()
    assert rows, "the 8x8 name grid must yield fuzzy pairs"
    for r in rows:
        # pairs are canonical (a < b), within block (shared noun),
        # and inside the distance threshold
        assert r.name_a < r.name_b
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]
        assert 1 <= r.dist <= 4
        assert r.pair_rows >= 1
    # a hand-checkable pair: cold ring vs old ring is one deletion
    by_pair = {(r.name_a, r.name_b): r.dist for r in rows}
    assert by_pair.get(("cold ring", "old ring")) == 1


def test_fuzzy_topk_match_recovers_originals(spark, sf_dir):
    """Dropping every 'e' from a name must still match back to that
    name: the corruption changes at most 2 chars of any name in the
    8x8 grid, while distinct grid names differ by more unless they
    share the block — (dist, name) ranking recovers the original."""
    from data_wrangler_spark.catalog import load_table

    n_names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct().count()
    )
    rows = REGISTRY["q_fuzzy_topk_match"].run(spark, sf_dir).collect()
    assert len(rows) == n_names  # one best match per distinct name
    recovered = sum(
        1 for r in rows if r.best_match.replace("e", "") == r.query
    )
    assert recovered == n_names
    # e-free names survive corruption verbatim and self-match at 0
    assert all(r.dist == 0 for r in rows if "e" not in r.best_match)
