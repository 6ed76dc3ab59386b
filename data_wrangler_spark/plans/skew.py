"""Skew-mitigation join helper: key salting.

AQE's skew-join splitting handles sort-merge skew automatically, but
two cases still need salting at 100 TB: (a) a broadcast-ineligible
dimension joined on a power-law key, (b) window/groupBy skew AQE does
not split. The classic remedy: replicate the small side R times, salt
the big side's key with hash(row) % R, join on (key, salt) — the hot
key's rows spread over R tasks.

Deterministic: the salt comes from hashing the big side's OTHER
columns (murmur3), not rand(), so retries and re-runs produce
identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str | Column,
    small_key: str | Column,
    salt_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` with the big side salted over
    ``n_salts`` partitions per key. ``salt_cols`` are big-side columns
    whose hash spreads the hot key (use a unique id)."""
    bkey = F.col(big_key) if isinstance(big_key, str) else big_key
    skey = F.col(small_key) if isinstance(small_key, str) else small_key

    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    joined = big_s.join(
        small_s, (bkey == skey) & (big_s["_salt"] == small_s["_salt"]), how
    )
    return joined.drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    n_shards: int = 16,
    out_col: str = "n_distinct",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Two-phase COUNT(DISTINCT val) per key with the distinct state
    salted over ``n_shards`` shards.

    Plain per-key count-distinct is the aggregation AQE cannot save:
    the distinct STATE (not the row count) concentrates on the hot
    key, so one task must hold and dedup that key's entire value set.
    Sharding by ``hash(val) % n_shards`` splits the state: a given
    value always lands in the same shard, so per-shard distinct
    counts are disjoint and their per-key sum is exactly the global
    distinct count. The hot key's state now spreads over ``n_shards``
    tasks; phase 2 merges ≤ n_shards small integers per key.

    ``extra_aggs`` are additional SUM-mergeable aggregates (counts,
    decimal sums) computed per shard in phase 1; phase 2 re-merges
    each one with an unconditional SUM under its original alias, so
    only aggregates whose merge IS a sum are valid here (a max/min
    would be silently summed — pass those through a separate plain
    groupBy instead).
    """
    shard = F.pmod(F.hash(F.col(val_col)), F.lit(n_shards)).alias("_shard")
    phase1 = df.groupBy(*[F.col(k) for k in key_cols], shard).agg(
        F.count_distinct(F.col(val_col)).alias("_pd"),
        *(extra_aggs or []),
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_pd").alias(out_col),
        *[
            F.sum(c).alias(c)
            for c in phase1.columns
            if c not in (*key_cols, "_shard", "_pd")
        ],
    )
