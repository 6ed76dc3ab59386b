"""Deterministic probabilistic-structure operators: Count-Min sketch
heavy hitters and a Bloom-filter pre-join — with EXACT oracles.

Spark's own sketches (HLL approx_count_distinct, GK
approx_percentile, runtime bloom-join) are engine-internal and can't
be cross-checked value-for-value against another engine (those stay
rows-only + pytest error-bound pins — see aggregates.py /
relational_extras.py). These two operators instead build the
sketches *in the data plane* from a cross-engine md5 hash family, so
the full sketch arithmetic — bucket counts, min-estimates, bit
membership, false-positive accounting — is bit-identical in DuckDB
and carries a real oracle. That is the point: the sketch logic the
engine would run at 100 TB is itself under the correctness gate.

Scale notes: both sketches are O(1)-size aggregation states built in
one partial+final pass over the data (the sketch tables are ≤ a few
thousand rows — broadcastable by construction); probes are
broadcast-hash lookups, never a shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.functions.text import TOKEN_REGEX
from data_wrangler_spark.operators.dedup import _md5_long, _sql_md5_long
from data_wrangler_spark.registry import register

CMS_DEPTH = 4       # hash rows
CMS_WIDTH = 1024    # buckets per row
CMS_MIN_COUNT = 40  # heavy-hitter report floor (true count)

BLOOM_BITS = 8192   # m
BLOOM_HASHES = 3    # k
BLOOM_SEGMENT = "BUILDING"


def _sql_seeds(n: int) -> str:
    return "[" + ", ".join(str(i + 1) for i in range(n)) + "]"


@register(
    "q_sketch_cms",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS token
      FROM documents),
    truec AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM tok GROUP BY token),
    cells AS (
      SELECT seed, {_sql_md5_long("(token || '#' || seed)")} % {CMS_WIDTH} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok, unnest({_sql_seeds(CMS_DEPTH)}) AS s(seed)
      GROUP BY 1, 2),
    probes AS (
      SELECT t.token, t.true_count, s.seed,
             {_sql_md5_long("(t.token || '#' || s.seed)")} % {CMS_WIDTH} AS bucket
      FROM truec t, unnest({_sql_seeds(CMS_DEPTH)}) AS s(seed)
      WHERE t.true_count >= {CMS_MIN_COUNT})
    SELECT p.token, p.true_count,
           MIN(c.cnt) AS cms_estimate,
           MIN(c.cnt) - p.true_count AS overestimate
    FROM probes p
    JOIN cells c ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.token, p.true_count
    """,
    tags=("ext", "sketch"),
)
def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters: every token occurrence
    increments CMS_DEPTH counters (md5-seeded buckets mod CMS_WIDTH);
    a token's estimate is the MIN of its counters — always ≥ the true
    count, with the overestimate column showing collision error. The
    sketch build is a single partial+final aggregation whose state is
    capped at depth×width cells no matter the corpus size (the
    defining CMS property); heavy-hitter probes then join the tiny
    cell table. Reported tokens are floored at a true count so the
    output is small and stable."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_REGEX), 0)
        ).alias("token")
    )
    seeds = F.array(*[F.lit(i + 1) for i in range(CMS_DEPTH)])
    # one (seed, bucket) cell per token occurrence × hash row
    cells = (
        tok.select("token", F.explode(seeds).alias("seed"))
        .select(
            "seed",
            (
                _md5_long(F.concat(F.col("token"), F.lit("#"), F.col("seed").cast("string")))
                % CMS_WIDTH
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    truec = tok.groupBy("token").agg(F.count("*").alias("true_count"))
    probes = (
        truec.filter(F.col("true_count") >= CMS_MIN_COUNT)
        .select("token", "true_count", F.explode(seeds).alias("seed"))
        .withColumn(
            "bucket",
            _md5_long(F.concat(F.col("token"), F.lit("#"), F.col("seed").cast("string")))
            % CMS_WIDTH,
        )
    )
    # cells ≤ depth×width rows by construction → broadcast the sketch
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("token", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .withColumn("overestimate", F.col("cms_estimate") - F.col("true_count"))
    )


@register(
    "q_bloom_join",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'),
    bits AS (
      SELECT DISTINCT
             {_sql_md5_long("(CAST(c_custkey AS VARCHAR) || '#' || seed)")}
               % {BLOOM_BITS} AS bit
      FROM dim, unnest({_sql_seeds(BLOOM_HASHES)}) AS s(seed)),
    pbits AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
             {_sql_md5_long("(CAST(o.o_custkey AS VARCHAR) || '#' || seed)")}
               % {BLOOM_BITS} AS bit
      FROM orders o
      CROSS JOIN unnest({_sql_seeds(BLOOM_HASHES)}) AS s(seed)),
    probe AS (
      SELECT p.o_orderkey, p.o_custkey, p.o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM pbits p JOIN bits b ON b.bit = p.bit
      GROUP BY 1, 2, 3),
    flagged AS (
      SELECT p.o_orderstatus,
             (p.n_hit = {BLOOM_HASHES}) AS bloom_pass,
             (d.c_custkey IS NOT NULL) AS true_match
      FROM probe p LEFT JOIN dim d ON d.c_custkey = p.o_custkey)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_match,
           CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM flagged
    GROUP BY o_orderstatus
    """,
    tags=("ext", "sketch"),
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join: hash the dim side (one segment's
    customers) into an m-bit / k-hash bit set, probe every order's
    custkey, and account — per order status — how many orders pass
    the bloom, truly match, and are false positives (bloom semantics:
    zero false negatives, bounded false positives). This is the
    shuffle-elimination pattern for selective joins at 100 TB: the
    bit table is O(m) regardless of dim size and broadcasts to every
    probe task, so the fact table is filtered in its scan stage
    before any join shuffle. Spark's own runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter) does this invisibly;
    here the structure is explicit, inspectable, and oracle-checked.
    The exact semi-join comparison quantifies the FP rate the
    downstream join still has to absorb."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT).select("c_custkey")
    seeds = F.array(*[F.lit(i + 1) for i in range(BLOOM_HASHES)])

    def bit_of(key_col):
        return (
            _md5_long(
                F.concat(key_col.cast("string"), F.lit("#"), F.col("seed").cast("string"))
            )
            % BLOOM_BITS
        )

    bits = (
        dim.select(F.explode(seeds).alias("seed"), "c_custkey")
        .select(bit_of(F.col("c_custkey")).alias("bit"))
        .distinct()
    )
    probe = (
        orders.select("o_orderkey", "o_custkey", "o_orderstatus")
        .withColumn("seed", F.explode(seeds))
        .withColumn("bit", bit_of(F.col("o_custkey")))
        .join(F.broadcast(bits), "bit")  # bit table ≤ BLOOM_BITS rows
        .groupBy("o_orderkey", "o_custkey", "o_orderstatus")
        .agg(F.count("*").alias("n_hit"))
    )
    flagged = probe.join(
        F.broadcast(dim.withColumnRenamed("c_custkey", "match_key")),
        probe["o_custkey"] == F.col("match_key"),
        "left",
    ).select(
        "o_orderstatus",
        (F.col("n_hit") == BLOOM_HASHES).alias("bloom_pass"),
        F.col("match_key").isNotNull().alias("true_match"),
    )
    return flagged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(F.col("true_match"), 1).otherwise(0)).alias("n_true_match"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("true_match"), 1).otherwise(0)
        ).alias("n_false_pos"),
    )
