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
