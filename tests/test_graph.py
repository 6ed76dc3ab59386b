"""PageRank pinned against an independent numpy power iteration —
the rows-only oracle contract for iterative algorithms."""

import numpy as np

from data_wrangler_spark.registry import REGISTRY


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    from data_wrangler_spark.operators.graph import (
        PR_DAMPING,
        PR_ITERATIONS,
        _edges,
    )

    edge_rows = _edges(spark, sf_dir).collect()
    got = {r.node: r.pagerank for r in REGISTRY["q_pagerank"].run(spark, sf_dir).collect()}

    nodes = sorted({r.src for r in edge_rows} | {r.dst for r in edge_rows})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    assert set(got) == set(nodes)

    out_deg = np.zeros(n)
    for r in edge_rows:
        out_deg[idx[r.src]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(PR_ITERATIONS):
        inflow = np.zeros(n)
        contrib = np.divide(rank, out_deg, out=np.zeros(n), where=out_deg > 0)
        for r in edge_rows:
            inflow[idx[r.dst]] += contrib[idx[r.src]]
        dangling = rank[out_deg == 0].sum()
        rank = (1.0 - PR_DAMPING) / n + PR_DAMPING * (inflow + dangling / n)

    assert abs(rank.sum() - 1.0) < 1e-9  # mass conserved
    spark_total = sum(got.values())
    assert abs(spark_total - 1.0) < 1e-9
    for node, i in idx.items():
        assert abs(got[node] - rank[i]) < 1e-9


def test_triangles_match_bruteforce(spark, sf_dir):
    """Independent check of the degree-oriented wedge join: adjacency
    sets in plain Python; sum over edges of |N(u) ∩ N(v)| counts each
    triangle three times."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_wrangler_spark.catalog import load_table

    po = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = {
        (r.u, r.v)
        for r in po.alias("a")
        .join(po.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .collect()
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri3 = sum(len(adj[u] & adj[v]) for u, v in edges)
    assert tri3 % 3 == 0
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())

    row = REGISTRY["q_triangles"].run(spark, sf_dir).first()
    assert row.n_edges == len(edges)
    assert row.n_wedges == wedges
    assert row.n_triangles == tri3 // 3
    assert abs(row.global_clustering - 3 * row.n_triangles / wedges) < 1e-12


def test_pagerank_exact_agrees_with_float_path(spark, sf_dir):
    """The integer micro-unit fixed point must sit within float-path
    noise of the standard implementation, and conserve total mass to
    within N ulps of truncation per iteration."""
    exact = {
        r.node: r.pagerank
        for r in REGISTRY["q_pagerank_exact"].run(spark, sf_dir).collect()
    }
    flt = {
        r.node: r.pagerank
        for r in REGISTRY["q_pagerank"].run(spark, sf_dir).collect()
    }
    assert set(exact) == set(flt)
    for node, p in exact.items():
        assert abs(p - flt[node]) < 1e-6
    # truncation loses < 1 micro-unit per edge-contribution per
    # iteration (plus the two divs), always downward — a deficit
    # bounded well under 1e-7 at these graph sizes
    total = sum(exact.values())
    assert 0 <= 1.0 - total < 1e-7
