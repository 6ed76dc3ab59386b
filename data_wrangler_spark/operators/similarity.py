"""Similarity search over embeddings (north star).

- `q_sim_search`: exact brute-force top-k cosine — the correctness
  baseline. One scan, per-row O(d) fold, TakeOrderedAndProject keeps
  a k-heap per task (no global sort).
- `q_sim_search_lsh`: random-hyperplane LSH bucketed search — the
  scale path: probe only vectors whose signature shares a band with
  the query, then exact-rank the candidates. Rows-only check (the
  candidate set is recall<1 by construction); pytest pins recall
  against brute force.
- `q_sim_join`: all-pairs cosine ≥ τ with pk-ordered pairs — exact
  (oracle-checked); at scale the same query runs after an LSH
  blocking stage (see q_dedup_embed for the blocked plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.functions.vectors import (
    cosine,
    sql_cosine,
    to_double_array,
)
from data_wrangler_spark.registry import register

N_PLANES = 16  # LSH hyperplanes → 16-bit signature, 4 bands × 4 bits


def _query_vec(spark: SparkSession, sf_dir: str):
    """The query point: embedding of the smallest vec_id (exists at
    every SF). Returned as (vec_id, broadcastable 1-row DataFrame)."""
    e = load_table(spark, sf_dir, "embeddings")
    qid = e.agg(F.min("vec_id")).collect()[0][0]
    q = e.filter(F.col("vec_id") == qid).select(
        to_double_array("embedding").alias("qe")
    )
    return qid, q


@register(
    "q_sim_search",
    oracle=f"""
    WITH n AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    q AS (SELECT e AS qe FROM n
          WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
    SELECT vec_id, label, {sql_cosine('e', 'qe')} AS cos_sim
    FROM n, q
    WHERE vec_id <> (SELECT min(vec_id) FROM embeddings)
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity"),
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of the first vector. Broadcast
    the single query row; cosine is a codegen'd fold; top-k plans as
    TakeOrderedAndProject (per-task heaps, no global sort)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("e")
    )
    qid, q = _query_vec(spark, sf_dir)
    return (
        e.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_sim", cosine(F.col("e"), F.col("qe")))
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register("q_sim_search_lsh", tags=("llm", "similarity", "approx"))  # rows-only: recall<1
def q_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane (sign-LSH) signatures from
    deterministic per-dimension hash weights; candidates = vectors
    sharing ≥1 of 4 signature bands with the query; exact cosine
    re-rank of candidates only. At 100 TB the bucket join replaces
    the full scan — probed partitions ∝ bucket selectivity."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("e")
    )
    qid, q = _query_vec(spark, sf_dir)

    # hyperplane p weight for dim i: deterministic pseudo-random ±1
    # from murmur3 — hash(i, p) keeps everything JVM-side.
    def plane_proj(vec_col, p: int):
        # projection of vec onto hyperplane p whose per-dim weights
        # are deterministic ±1 from murmur3(i, p); factory keeps the
        # zip_with lambda 2-arg (PySpark introspects Python arity).
        def weight(x, i):
            return x * (F.hash(i, F.lit(p)).bitwiseAND(F.lit(1)) * 2 - 1).cast("double")

        return F.aggregate(
            F.zip_with(vec_col, F.sequence(F.lit(0), F.size(vec_col) - 1), weight),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def signature(vec_col):
        bits = [
            F.when(plane_proj(vec_col, p) > 0, F.lit(1)).otherwise(F.lit(0))
            for p in range(N_PLANES)
        ]
        # 4 bands × 4 bits
        band_vals = []
        for b in range(4):
            v = F.lit(0)
            for r in range(4):
                v = v + bits[b * 4 + r] * (1 << r)
            band_vals.append(v)
        return F.array(*band_vals)

    sig = e.withColumn("sig", signature(F.col("e")))
    qsig = (
        q.withColumn("sig", signature(F.col("qe")))
        .select("qe", F.posexplode("sig").alias("band", "bucket"))
    )
    cand = (
        sig.select("vec_id", "label", "e", F.posexplode("sig").alias("band", "bucket"))
        .join(F.broadcast(qsig), ["band", "bucket"])
        .filter(F.col("vec_id") != qid)
        .dropDuplicates(["vec_id"])
    )
    return (
        cand.withColumn("cos_sim", cosine(F.col("e"), F.col("qe")))
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "q_sim_join",
    oracle=f"""
    WITH n AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_cosine('a.e', 'b.e')} AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {sql_cosine('a.e', 'b.e')} >= 0.35
    """,
    tags=("llm", "similarity"),
)
def q_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs similarity join (cosine ≥ 0.35). Correctness
    baseline for the LSH-blocked variant; the n² pair space is the
    reason the blocked plan exists — kept exact here so the oracle
    can verify it."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("e")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos_sim") >= 0.35)
        .select("vec_a", "vec_b", "cos_sim")
    )
