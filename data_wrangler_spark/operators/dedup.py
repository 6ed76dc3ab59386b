"""Deduplication operators for training-data pipelines (north star).

Five dedup strategies over `documents` / `embeddings`, each the
Spark-shaped version of the standard corpus-dedup stack:

- exact:     hash-groupBy on a normalized fingerprint (1 shuffle of
             16-byte keys — the only scalable exact method);
- MinHash:   shingle → k minhashes → banded LSH → bucket self-join
             (candidate pairs without the O(n²) comparison);
- SimHash:   64-bit sign-of-weighted-sum signature → band buckets;
- Jaccard:   exact n-gram Jaccard on candidate pairs (the verifier
             stage after LSH; here run on the shingle-share blocking);
- embedding: cosine near-dup within blocks.

Scale notes: every strategy is shuffle-on-small-key. The O(n²) danger
lives only in the bucket self-joins; band width controls bucket size,
and the `hot-bucket` guard (bucket_size cap) bounds the worst case —
at 100 TB a bucket with a million identical boilerplate docs would
otherwise explode the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.functions.text import (
    shingles_from_words,
    sql_shingles_of,
    sql_words,
)
from data_wrangler_spark.functions.vectors import (
    sql_dot,
    sql_norm,
    sql_round6,
    to_double_array,
)
from data_wrangler_spark.registry import register

N_MINHASH = 16  # minhash signature length
N_BANDS = 4  # LSH bands (rows per band = 16/4 = 4)
MAX_BUCKET = 1000  # hot-bucket guard for the self-join


@register(
    "q_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per normalized-text
    fingerprint. Deterministic keeper choice (vs. dropDuplicates'
    arbitrary row). Shuffles only (digest, doc_id) pairs."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def _minhash_signatures(d: DataFrame) -> DataFrame:
    """doc_id → N_MINHASH minhash values over word-3-gram shingles.

    One row per doc throughout: the k minhashes are computed with
    array_min over transform(shingles, hash(shingle, seed)) — no
    explode, no shuffle until the band grouping. Words and shingles
    are bound to columns first so the tokenizer runs once per doc,
    not once per lambda evaluation.
    """
    from data_wrangler_spark.functions.text import words

    sh = d.select("doc_id", words("text").alias("w")).select(
        "doc_id", shingles_from_words(F.col("w"), 3).alias("sh")
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), lambda s: F.hash(s, F.lit(j))))
            for j in range(N_MINHASH)
        ]
    )
    return sh.select("doc_id", sig.alias("sig"))


@register("q_dedup_minhash", tags=("llm", "dedup", "approx"))  # rows-only: Spark hash ≠ DuckDB hash
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 16 minhashes over word
    3-gram shingles, 4 bands × 4 rows; docs sharing any band bucket
    are candidates. Output: candidate pair + how many bands agree
    (monotone in estimated Jaccard). Deterministic (murmur3 with
    fixed seeds) but not SQL-expressible in DuckDB → rows-only check;
    pytest pins its behavior against exact Jaccard instead."""
    d = load_table(spark, sf_dir, "documents")
    sigs = _minhash_signatures(d)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[F.element_at("sig", b * (N_MINHASH // N_BANDS) + r + 1)
                              for r in range(N_MINHASH // N_BANDS)]
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    # hot-bucket guard: cap pathological buckets before the self-join
    sized = bands.withColumn(
        "bsize", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsize") <= MAX_BUCKET)
    a = sized.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = sized.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("band").alias("n_bands"))
    )


def simhash_signatures(d: DataFrame) -> DataFrame:
    """doc_id → 64-bit TF-weighted SimHash of the whitespace tokens.

    bit i of the signature = sign of Σ_tokens (xxhash64(token) bit i
    ? +1 : -1) — token repeats ARE the term-frequency weighting (on
    this corpus TF-weighting drops near-dup hamming to ~2 bits vs
    ~19 for random pairs; distinct-token hashing was unstable).
    All array ops, one row per doc, no shuffle.
    """
    from data_wrangler_spark.functions.text import words

    hashed = d.select(
        "doc_id",
        F.transform(words("text"), lambda w: F.xxhash64(w)).alias("wh"),
    )

    # Factory function keeps the lambda 2-arg (PySpark introspects
    # Python arity; closure-default tricks would make it 3-arg).
    def bitsum(i: int):
        return F.aggregate(
            F.col("wh"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    # bit 63 is the sign bit: 1<<63 only exists as the min-long value
    masks = [1 << i for i in range(63)] + [-(1 << 63)]
    simhash_col = F.lit(0).cast("long")
    for i in range(64):
        simhash_col = simhash_col.bitwiseOR(
            F.when(bitsum(i) > 0, F.lit(masks[i]).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return hashed.select("doc_id", simhash_col.alias("simhash"))


@register("q_dedup_simhash", tags=("llm", "dedup", "approx"))  # rows-only: xxhash64 ≠ DuckDB hash
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 64-bit signature = sign of the
    per-bit sum over xxhash64(word) (+1/-1 weighting), bucketed by
    four 16-bit bands. Output: doc pairs sharing ≥1 band with their
    signatures. One scan + one small-key shuffle; no explode (the
    64 bit-sums are array ops on one row)."""
    sim = simhash_signatures(load_table(spark, sf_dir, "documents"))
    banded = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    a = banded.select("band", "bucket", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = banded.select("band", "bucket", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sim_a", "sim_b")
        .agg(F.countDistinct("band").alias("n_bands"))
    )


@register(
    "q_dedup_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {sql_shingles_of('w', 3)} AS shingles
      FROM (SELECT doc_id, {sql_words('text')} AS w FROM documents)),
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE)
             / (len(sa.shingles) + len(sb.shingles) - i.n_inter) AS jaccard
    FROM inter i
    JOIN sh sa ON sa.doc_id = i.doc_a
    JOIN sh sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE)
            / (len(sa.shingles) + len(sb.shingles) - i.n_inter) >= 0.05
    """,
    tags=("llm", "dedup"),
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ 0.05: explode distinct shingles,
    self-equi-join on shingle (the blocking — only docs sharing a
    shingle are compared), count intersections, |A∪B| by
    inclusion-exclusion. This is the verify stage of MinHash pipelines
    run standalone; the shingle join is an equi-shuffle, never a
    cross-join."""
    from pyspark import StorageLevel

    from data_wrangler_spark.functions.text import words

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", words("text").alias("w")).select(
        "doc_id", shingles_from_words(F.col("w"), 3).alias("shingles")
    )
    # Materialize the shingle arrays once: Generate (explode) inlines
    # its child expression into the codegen'd emit loop, re-running
    # the whole shingle transform PER ELEMENT (~50×; measured 16s vs
    # 0.3s at sf0.1), and the table feeds three consumers (two join
    # sides + sizes). ~2 MB per 5k docs; at corpus scale this is a
    # checkpoint to storage instead.
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = ex.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    # sizes is tiny (one int per doc) — broadcast both lookups so the
    # 1M-pair intersection table never shuffles again
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.05).select("doc_a", "doc_b", "jaccard")


@register(
    "q_dedup_embed",
    oracle=f"""
    WITH n AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
             {sql_round6(f"{sql_dot('a.e', 'b.e')} / ({sql_norm('a.e')} * {sql_norm('b.e')})")} AS cos_sim
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, label, cos_sim FROM scored WHERE cos_sim >= 0.3
    """,
    tags=("llm", "dedup"),
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup within label blocks: equi-join on the
    block key (label) rules out the O(n²) cross-join, then cosine
    ≥ 0.3 (at 1e-6 precision) inside each block — norms once per
    vector JVM-side, dot products Arrow-vectorized (make_dot_udf).
    At 100 TB the block key is an LSH bucket or cluster id; the plan
    shape is identical."""
    from data_wrangler_spark.functions.vectors import make_dot_udf, norm, round6

    raw = load_table(spark, sf_dir, "embeddings")
    e = raw.select(
        "vec_id", "label", to_double_array("embedding").alias("e")
    ).withColumn("nrm", norm(F.col("e")))
    a = e.select(F.col("vec_id").alias("vec_a"), "label",
                 F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), "label",
                 F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    dot_udf = make_dot_udf()
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_sim",
            round6(dot_udf(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))),
        )
        .filter(F.col("cos_sim") >= 0.3)
        .select("vec_a", "vec_b", "label", "cos_sim")
    )
