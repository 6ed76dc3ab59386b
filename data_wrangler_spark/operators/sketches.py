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


KMV_K = 256          # retained minimum hash values
KMV_SPACE = 1 << 48  # 48-bit hash space (12 md5 hex digits)
KMV_SHARDS = 4       # arbitrary data split for the merge proof
KMV_BAND_PCT = 20    # |est-exact| acceptance band (σ ≈ 1/√(K-2) ≈ 6.3%)


def _kmv_h(col):
    """48-bit md5-derived hash — cross-engine (see dedup._md5_long)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")


def _sql_kmv_h(expr: str) -> str:
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 12))::BIGINT)"


@register(
    "q_sketch_kmv",
    oracle=f"""
    WITH vals AS (SELECT DISTINCT l_orderkey AS v FROM lineitem),
    h AS (SELECT {_sql_kmv_h('v')} AS h FROM vals),
    kth AS (SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS k
            FROM (SELECT h FROM h ORDER BY h LIMIT {KMV_K})),
    exact AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM vals),
    shard_h AS (
      SELECT DISTINCT l_suppkey % {KMV_SHARDS} AS shard,
             {_sql_kmv_h('l_orderkey')} AS h
      FROM lineitem),
    shard_kept AS (
      SELECT h FROM (
        SELECT h, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h) AS rn
        FROM shard_h) WHERE rn <= {KMV_K}),
    merged AS (SELECT max(h) AS hk_merged
               FROM (SELECT DISTINCT h FROM shard_kept ORDER BY h LIMIT {KMV_K}))
    SELECT k, kth_min_hash, est_distinct, exact_distinct,
           abs(est_distinct - exact_distinct) AS abs_err,
           (abs(est_distinct - exact_distinct) * 100
              <= exact_distinct * {KMV_BAND_PCT})     AS within_band,
           merge_exact
    FROM (
      SELECT k.k, k.hk AS kth_min_hash,
             CASE WHEN k.k < {KMV_K} THEN k.k
                  ELSE ({KMV_K - 1} * {KMV_SPACE}) // k.hk
             END                                      AS est_distinct,
             e.n_exact                                AS exact_distinct,
             (m.hk_merged = k.hk)                     AS merge_exact
      FROM kth k, exact e, merged m)
    """,
    tags=("ext", "sketch"),
)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch —
    the mergeable distinct estimator whose arithmetic, unlike HLL's,
    is fully replayable cross-engine: keep the K smallest 48-bit md5
    hashes of the distinct values; the K-th minimum h_K estimates
    |D| ≈ (K-1)·2^48 / h_K (Bar-Yossef et al. 2002), here in pure
    BIGINT integer division so Spark and DuckDB agree bit-for-bit.

    Two properties are pinned in the SAME result row: (a) the
    estimate lands within the contract band of the exact distinct
    count, and (b) MERGEABILITY — the corpus is split into 4
    arbitrary overlapping shards (by l_suppkey, NOT by value), each
    shard keeps its own bottom-K, and merging (union → distinct →
    bottom-K) reproduces the global K-th minimum exactly, because a
    shard's value set is a subset of the global set, so every global
    bottom-K hash survives in any shard that contains it.

    Scale: the sketch state is K longs per (shard of the) corpus; the
    global bottom-K is one TakeOrderedAndProject (per-partition top-K
    then a K-row driver merge — no global sort), the per-shard pass
    is a bounded rank-≤K window, and the final row assembles three
    broadcast 1-row frames. This is how COUNT DISTINCT dashboards
    run over 100 TB: per-partition bottom-K partials, K-row merges,
    never a shuffle of the raw values."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(F.col("l_orderkey").alias("v")).distinct()
    h = vals.select(_kmv_h(F.col("v")).alias("h"))

    kth = (
        h.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("hk"), F.count("*").cast("long").alias("k"))
    )
    exact = vals.agg(F.count("*").cast("long").alias("n_exact"))

    shard_h = li.select(
        (F.col("l_suppkey") % KMV_SHARDS).alias("shard"),
        _kmv_h(F.col("l_orderkey")).alias("h"),
    ).distinct()
    w = Window.partitionBy("shard").orderBy("h")
    shard_kept = (
        shard_h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("h")
    )
    merged = (
        shard_kept.distinct()
        .orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("hk_merged"))
    )

    # standard KMV small-set branch: with fewer than K retained
    # hashes the sketch holds the whole distinct set — return it
    est = F.when(F.col("k") < KMV_K, F.col("k")).otherwise(
        F.expr(f"div({KMV_K - 1}L * {KMV_SPACE}L, hk)")
    )
    return (
        kth.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(merged))
        .select(
            "k",
            F.col("hk").alias("kth_min_hash"),
            est.alias("est_distinct"),
            F.col("n_exact").alias("exact_distinct"),
            F.abs(est - F.col("n_exact")).alias("abs_err"),
            (F.abs(est - F.col("n_exact")) * 100 <= F.col("n_exact") * KMV_BAND_PCT)
            .alias("within_band"),
            (F.col("hk_merged") == F.col("hk")).alias("merge_exact"),
        )
    )
