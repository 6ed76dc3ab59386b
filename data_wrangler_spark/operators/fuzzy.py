"""Fuzzy string matching for entity resolution (north star).

The reference gateway exposes only exact-match lookups (`sortby`/`id`
equality routes, `/root/reference/index.js:434-480`); fuzzy/approximate
matching is a north-star extension — the entity-resolution step every
training-data pipeline needs (merging near-identical names, spell-
correcting noisy keys) expressed Spark-first.

Scale design (100 TB): never edit-distance the fact table. Both
operators run **dictionary-first** — `groupBy` collapses billions of
fact rows to the distinct-key dictionary (for text keys typically
10^4-10^7 entries, orders of magnitude smaller), the O(n²)-ish fuzzy
stage runs on the dictionary only, inside *blocks* (cheap equality
keys: last token / first char) so candidate pairs stay bounded, with a
length-band prefilter and a thresholded Levenshtein (Spark's 3-arg
`levenshtein` bails out of the DP early past the bound) before the
exact distance is kept. Mapping matches back to fact rows is a
broadcast join of the (tiny) match table. Blocks are hash-partitioned
by Catalyst — skewed blocks split further by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.registry import register


@register(
    "q_fuzzy_join_edit",
    oracle="""
    WITH dic AS (
        SELECT p_name,
               split_part(p_name, ' ', 2) AS block,
               CAST(count(*) AS BIGINT)   AS cnt
        FROM part
        GROUP BY p_name
    )
    SELECT a.p_name                                AS name_a,
           b.p_name                                AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
           CAST(a.cnt * b.cnt AS BIGINT)           AS pair_rows
    FROM dic a
    JOIN dic b
      ON a.block = b.block
     AND a.p_name < b.p_name
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 4
      AND levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("llm", "fuzzy", "dedup"),
)
def q_fuzzy_join_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join on part names: distinct-key dictionary →
    block on the noun (last token) → length-band prefilter → thresholded
    Levenshtein ≤ 4. `pair_rows` = how many fact-row pairs each
    dictionary match represents (the dictionary-first rewrite's win:
    the quadratic stage ran on 64 names, not 2000 rows)."""
    dic = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("cnt"))
        .withColumn("block", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a, b = dic.alias("a"), dic.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        # necessary condition for dist<=4: cheap prune before the DP
        .filter(F.abs(F.length("a.p_name") - F.length("b.p_name")) <= 4)
        .withColumn("dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 4))
        .filter(F.col("dist") >= 0)  # 3-arg levenshtein: -1 = over threshold
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
            (F.col("a.cnt") * F.col("b.cnt")).alias("pair_rows"),
        )
    )


@register(
    "q_fuzzy_topk_match",
    oracle="""
    WITH dic AS (SELECT DISTINCT p_name FROM part),
    queries AS (
        SELECT p_name AS orig, replace(p_name, 'e', '') AS query FROM dic
    ),
    scored AS (
        SELECT q.query,
               d.p_name AS candidate,
               CAST(levenshtein(q.query, d.p_name) AS INT) AS dist,
               row_number() OVER (
                   PARTITION BY q.query
                   ORDER BY levenshtein(q.query, d.p_name), d.p_name
               ) AS rn
        FROM queries q
        JOIN dic d ON substr(q.query, 1, 1) = substr(d.p_name, 1, 1)
    )
    SELECT query, candidate AS best_match, dist
    FROM scored WHERE rn = 1
    """,
    tags=("llm", "fuzzy"),
)
def q_fuzzy_topk_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell-correct lookup: noisy query keys (names with every 'e'
    dropped) matched to their best dictionary entry by edit distance,
    blocked on first character. The query set is small by construction
    → at scale it broadcasts and the dictionary is scanned once; ties
    break deterministically by (dist, candidate)."""
    dic = load_table(spark, sf_dir, "part").select("p_name").distinct()
    queries = dic.select(
        F.replace(F.col("p_name"), F.lit("e"), F.lit("")).alias("query")
    )
    scored = (
        F.broadcast(queries)
        .join(
            dic.alias("d"),
            F.substring("query", 1, 1) == F.substring(F.col("d.p_name"), 1, 1),
        )
        .select(
            "query",
            F.col("d.p_name").alias("candidate"),
            F.levenshtein(F.col("query"), F.col("d.p_name")).alias("dist"),
        )
    )
    w = Window.partitionBy("query").orderBy("dist", "candidate")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query", F.col("candidate").alias("best_match"), "dist")
    )
