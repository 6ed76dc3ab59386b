"""Iterative graph analytics over relational-derived edges.

The reference has no graph surface; this is north-star coverage of
the `iterative algorithms` class the driver contract calls out as
legitimately non-SQL-expressible (alongside custom stateful
streaming). `q_dedup_cluster` (pipeline_ops.py) already covers
label-propagation connected components WITH an exact recursive-CTE
oracle; PageRank here is numeric-iterative — the oracle contract is
rows-only and tests/test_graph.py pins the values against an
independent numpy power iteration at 1e-9.

Scale design: edges are the persistent operand — cache them
partitioned by src (one shuffle, reused every iteration). Each
iteration is contribution-explode → sum-by-dst: a single exchange on
dst per iteration, partial-aggregated map-side. Ranks are
O(|nodes|) and join edges co-partitioned. Dangling mass is folded
back via a 1-row broadcast, not a collect. Iteration count is fixed
(power iteration converges geometrically at damping=0.85); at 100 TB
checkpoint the rank lineage every few iterations to cut the DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.registry import register

PR_ITERATIONS = 8
PR_DAMPING = 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer→supplier edges: c bought a part supplied by
    s (distinct pairs). Node ids are disjoint: customers as-is,
    suppliers offset into their own id space."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup_offset = 10_000_000
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + sup_offset).alias("dst"),
        )
        .distinct()
    )


@register("q_pagerank", tags=("ext", "graph", "iterative"))  # rows-only: iterative, non-SQL
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank by fixed-count power iteration on the bipartite
    customer→supplier purchase graph. Per iteration: distribute each
    node's rank over its out-edges (broadcast-joined out-degrees),
    sum contributions by dst, fold dangling-node mass back uniformly
    (1-row broadcast — no collect), apply damping. Ranks for nodes
    with no in-edges come from the teleport + dangling terms via a
    left join on the node universe. Values are pinned by
    tests/test_graph.py against an independent numpy power iteration
    (1e-9); rank sums are conserved at 1 every iteration."""
    edges = _edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()

    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))

    for _ in range(PR_ITERATIONS):
        contribs = (
            edges.join(F.broadcast(out_deg), "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # mass parked on dangling nodes (no out-edges) teleports uniformly
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMPING) / n_nodes)
                    + F.lit(PR_DAMPING)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            # truncate lineage: ranks(i) feeds both the contribution
            # join and the dangling aggregate of iteration i+1 — without
            # a checkpoint the logical plan doubles per iteration
            .localCheckpoint()
        )

    return ranks.select("node", F.col("rank").alias("pagerank"))
