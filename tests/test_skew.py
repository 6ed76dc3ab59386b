"""Salted-join equivalence: same result as the plain join, spread
over n_salts × more tasks on the hot key."""

from pyspark.sql import functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.plans.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    plain = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_name"
    )
    salted = salted_join(
        li,
        part,
        "l_partkey",
        "p_partkey",
        salt_cols=["l_orderkey", "l_linenumber"],
        n_salts=4,
    ).select("l_orderkey", "l_linenumber", "p_name")

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    out = salted_join(
        n, s, "n_nationkey", "s_nationkey", salt_cols=["n_nationkey"], n_salts=4,
        how="left",
    )
    # every nation appears; nations without suppliers carry nulls
    assert out.select("n_nationkey").distinct().count() == n.count()


def test_q_join_skewed_plan_salts_hot_key(spark, sf_dir):
    """The registered skew query must actually join on the salt: with
    broadcast disabled (the regime where salting matters — AQE cannot
    split a broadcast-ineligible hash join), the physical join keys
    include the _salt column and results still match the plain join."""
    from data_wrangler_spark.operators.joins import q_join_skewed

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_join_skewed(spark, sf_dir)
        plan = df._jdf.queryExecution().toString()
        assert "_salt" in plan
        rows = {r.c_custkey: (r.n_orders, round(r.total_spend, 2)) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = (
        o.select(
            F.when(F.col("o_custkey") % 10 < 9, F.lit(1).cast("long"))
            .otherwise(F.col("o_custkey"))
            .alias("sk_custkey"),
            "o_totalprice",
        )
        .join(c, F.col("c_custkey") == F.col("sk_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(22,6)"))
            .cast("double")
            .alias("total_spend"),
        )
    )
    expect = {
        r.c_custkey: (r.n_orders, round(r.total_spend, 2)) for r in plain.collect()
    }
    assert rows == expect


def test_range_bucketed_equals_nested_loop_and_plans_hash_join(spark, sf_dir):
    """The bucketized range join must return exactly the nested-loop
    join's rows while planning as an equi (hash) join, not BNLJ."""
    from data_wrangler_spark.operators.joins import (
        q_join_range,
        q_join_range_bucketed,
    )

    a = sorted(map(tuple, q_join_range(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_join_range_bucketed(spark, sf_dir).collect()))
    assert a == b and a
    plan = q_join_range_bucketed(spark, sf_dir)._jdf.queryExecution().toString()
    assert "HashJoin" in plan and "BroadcastNestedLoopJoin" not in plan


def test_q_agg_skewed_two_phase_and_equals_plain(spark, sf_dir):
    """The salted distinct must (a) actually shard phase 1 on _shard
    (visible in the analyzed plan's first aggregate grouping) and
    (b) merge back to exactly the single-phase COUNT(DISTINCT)."""
    from data_wrangler_spark.operators.aggregates import q_agg_skewed

    df = q_agg_skewed(spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "_shard" in plan

    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.select(
            F.when(F.col("l_suppkey") % 10 < 9, F.lit(1).cast("long"))
            .otherwise(F.col("l_suppkey"))
            .alias("sk_suppkey"),
            "l_orderkey",
        )
        .groupBy("sk_suppkey")
        .agg(F.count_distinct("l_orderkey").alias("n_orders"))
    )
    expect = {r.sk_suppkey: r.n_orders for r in plain.collect()}
    got = {r.sk_suppkey: r.n_orders for r in df.collect()}
    assert got == expect


def test_salted_distinct_count_disjoint_shards(spark):
    """Same value → same shard, so shard counts sum to the exact
    distinct count even when one key holds every row."""
    from data_wrangler_spark.plans.skew import salted_distinct_count

    df = spark.range(10000).select(
        F.lit("hot").alias("k"), (F.col("id") % 137).alias("v")
    )
    out = salted_distinct_count(df, ["k"], "v", n_shards=8).collect()
    assert out[0].n_distinct == 137


def test_null_skew_plan_bypasses_shuffle_for_null_keys(spark, sf_dir):
    """The segregated plan must (a) union a bypass branch, (b) join
    only the IsNotNull side, and (c) reproduce the plain nullable-key
    LEFT JOIN's aggregate exactly."""
    from data_wrangler_spark.operators.joins import q_join_null_skew

    df = q_join_null_skew(spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "Union" in plan
    assert "isnotnull(k" in plan.lower().replace(" ", "") or "IsNotNull" in plan

    o = load_table(spark, sf_dir, "orders").selectExpr(
        "CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey END AS k",
        "o_orderstatus",
        "o_totalprice",
    )
    c = load_table(spark, sf_dir, "customer")
    plain = (
        o.join(c, F.col("k") == F.col("c_custkey"), "left")
        .groupBy("o_orderstatus", F.col("c_custkey").isNotNull().alias("matched"))
        .agg(F.count("*").alias("n_orders"))
    )
    expect = {(r.o_orderstatus, r.matched): r.n_orders for r in plain.collect()}
    got = {(r.o_orderstatus, r.matched): r.n_orders for r in df.collect()}
    assert got == expect


def test_window_skewed_equals_naive_window(spark, sf_dir):
    """The two-phase chunked form must be row-identical to the naive
    single-partition window over the same planted skew key — the
    mitigation may only change the plan, never the answer."""
    from pyspark.sql import Window, functions as F

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.registry import REGISTRY

    got = {
        r.o_orderkey: (r.skew_key, r.running_spend)
        for r in REGISTRY["q_window_skewed"].run(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    sk = F.when(F.col("o_custkey") % 4 == 0, F.lit(-1)).otherwise(
        F.col("o_custkey")
    ).cast("long")
    w = Window.partitionBy("skew_key").orderBy(
        "o_orderdate", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    naive = o.select(
        "o_orderkey", sk.alias("skew_key"), "o_orderdate", cents.alias("_c")
    ).withColumn("_rs", F.sum("_c").over(w))
    want = {
        r.o_orderkey: (r.skew_key, r._rs / 100.0) for r in naive.collect()
    }
    assert got == want
    # the planted skew is real: the hot key holds ~25% of the table
    n_hot = sum(1 for v in got.values() if v[0] == -1)
    assert 0.15 * len(got) < n_hot < 0.35 * len(got)


def test_window_skew_detection_is_data_driven(spark, sf_dir):
    """The hot set is derived from key counts, not planted: the
    synthetic -1 key (~25% of orders) is detected — and ONLY it —
    while a uniform corpus yields an empty hot set, sending
    q_window_skewed down the all-cold path untouched."""
    from data_wrangler_spark.operators.windows import (
        SKEW_HOT_DEN,
        _skew_base,
        hot_keys,
    )

    hot = hot_keys(_skew_base(spark, sf_dir)).collect()
    assert [r.skew_key for r in hot] == [-1]
    assert hot[0].share_micro * SKEW_HOT_DEN > 1_000_000

    uniform = spark.range(0, 2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 100).alias("skew_key"),
        F.lit("2024-01-01").cast("date").alias("o_orderdate"),
        F.lit(1).cast("long").alias("_c"),
    )
    assert hot_keys(uniform).count() == 0


def test_max_cell_caps_skewed_quantizer(spark, tmp_path, monkeypatch):
    """MAX_CELL hot-cell guard (the embedding family's MAX_BUCKET):
    on a deliberately degenerate corpus — every vector within a few
    degrees of one direction, so the quantizer piles everything into
    one cell — the sub-split must (a) bound candidate fan-out to
    ~n × MAX_CELL instead of the within-cell n²/2, (b) stay
    hash-exact against the DuckDB oracle regenerated under the same
    cap, and (c) be visible in q_embed_cell_audit's accounting row
    (capped=True, n_sub = ceil(n / MAX_CELL))."""
    import duckdb
    import numpy as np

    import data_wrangler_spark.operators.dedup as dd
    from data_wrangler_spark.operators.embeddings_ext import (
        kmeans_assign_mat,
        kmeans_fit_mat,
    )

    rng = np.random.default_rng(7)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    n = 400
    vecs = u + 0.05 * rng.normal(size=(n, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 4)) for i in range(n)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    sfd = str(tmp_path)

    monkeypatch.setattr(dd, "MAX_CELL", 16)

    # (c) the accounting row: one dominant cell, capped, arity right
    audit = {r.cell: r for r in dd.q_embed_cell_audit(spark, sfd).collect()}
    hot = max(audit.values(), key=lambda r: r.n_members)
    assert hot.n_members > 16 and hot.capped
    assert hot.n_sub == -(-hot.n_members // 16)

    # (a) bounded fan-out: per-(cell, sub) populations make candidate
    # volume linear in n, far under the uncapped within-cell n²/2
    v_arr, cl_ids, cmat = kmeans_fit_mat(spark, sfd)
    asg = kmeans_assign_mat(v_arr, cl_ids, cmat).select(
        "vec_id", F.col("cl").cast("int").alias("cell")
    )
    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.functions.vectors import to_double_array

    e = (
        load_table(spark, sfd, "embeddings")
        .select("vec_id", to_double_array("embedding").alias("e"))
        .join(asg, "vec_id")
    )
    es = dd._with_sub(e, dd._cell_subs(e), "e")
    sizes = [r["count"] for r in es.groupBy("cell", "sub").count().collect()]
    capped_pairs = sum(s * (s - 1) // 2 for s in sizes)
    uncapped_pairs = sum(
        m * (m - 1) // 2 for m in (r.n_members for r in audit.values())
    )
    assert capped_pairs <= n * 16
    assert capped_pairs < uncapped_pairs / 3

    # (b) oracle parity under skew: the Spark keeper output equals
    # the DuckDB replay with the SAME patched cap baked in
    got = sorted(
        (r.vec_dup, r.kept_id, r.cell, round(r.cos_to_kept, 6))
        for r in dd.q_dedup_semantic(spark, sfd).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sfd}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(dd._semantic_oracle()).fetchall()
    )
    assert got == want and len(got) > 0
