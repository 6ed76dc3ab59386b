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


def test_dedup_fuzzy_fastss_blocking_is_exact(spark, sf_dir):
    """r16: q_dedup_fuzzy's FastSS deletion-neighborhood blocking must
    be LOSSLESS for edit distance <= 1 — every brute-force qualifying
    pair survives the candidate generation, and nothing extra leaks
    through the bounded-levenshtein verify. Brute force is recomputed
    here over the real fixture (within-nation pairs), so this is an
    independent full-recall pin, not a plan check. The crafted cases
    each edit class must cover: equal names, one substitution, one
    insertion/deletion (length +-1), and a distance-2 near-miss that
    shares a deletion variant but must be verified away."""
    from data_wrangler_spark.catalog import load_table

    rows = REGISTRY["q_dedup_fuzzy"].run(spark, sf_dir).collect()
    got = {(r.cust_a, r.cust_b): r.edit_dist for r in rows}

    import itertools

    def lev(a, b, bound=1):
        if abs(len(a) - len(b)) > bound:
            return bound + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            if min(cur) > bound:
                return bound + 1
            prev = cur
        return prev[-1]

    by_nation = {}
    for r in load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).collect():
        by_nation.setdefault(r.c_nationkey, []).append((r.c_custkey, r.c_name))
    want = {}
    for members in by_nation.values():
        for (ka, na), (kb, nb) in itertools.combinations(sorted(members), 2):
            d = lev(na, nb)
            if d <= 1:
                want[(ka, kb)] = d
    assert got == want

    # the crafted edit classes on a synthetic frame through the same
    # candidate machinery: run the registered builder's logic via a
    # temp parquet fixture would re-test the oracle; instead assert
    # the deletion-variant lemma directly on adversarial strings
    def variants(s):
        return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}

    for a, b, d in [
        ("abc", "abc", 0),     # equal
        ("abc", "axc", 1),     # substitution
        ("abc", "abxc", 1),    # insertion
        ("abcd", "abc", 1),    # deletion
    ]:
        assert variants(a) & variants(b), (a, b)
        assert lev(a, b) == d
    # distance-2 near-miss that SHARES a variant: candidate generated,
    # verify must reject it (the reason the bounded levenshtein stays)
    assert variants("ab") & variants("ba")
    assert lev("ab", "ba") == 2
