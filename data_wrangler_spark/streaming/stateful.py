"""Custom stateful streaming: applyInPandasWithState.

The arbitrary-state operator Structured Streaming exposes to Python —
per-key state that survives across micro-batches, with Arrow-batched
group slices. Used here for a per-user running aggregate; the same
skeleton carries sessionization-with-side-outputs, CDC folding, or
feature back-fill at scale (state store shards = shuffle partitions;
RocksDB provider at 100 TB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_wrangler_spark.registry import register
from data_wrangler_spark.streaming.windows import _run_stream, _staged_events


def _update_user_totals(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold (count, cents) per user across micro-batches; emit the
    running totals after each batch that touches the user. Money is
    accumulated as integer cents so the result is exact regardless of
    fold order (float sums are batch-order dependent)."""
    (user_id,) = key
    if state.exists:
        n_events, cents = state.get
    else:
        n_events, cents = 0, 0
    for pdf in pdf_iter:
        n_events += len(pdf)
        cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
    state.update((n_events, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "total_cents": [cents]}
    )


@register(
    "q_stream_stateful",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
             AS total_value
    FROM events
    GROUP BY user_id
    """,
    tags=("stream", "stateful"),
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime totals via arbitrary stateful processing: the
    events table streamed in two micro-batches, state folded with
    applyInPandasWithState, and the LAST emission per user taken as
    the final state. Because the fold is exact integer arithmetic,
    the final state provably equals the batch GROUP BY — giving this
    streaming-only operator a SQL oracle."""
    base, ev = _staged_events(spark, sf_dir, "stateful", split_frac=0.5)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType="user_id bigint, n_events bigint, total_cents bigint",
            stateStructType="n_events bigint, total_cents bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_stream(stream, "q_stream_stateful", output_mode="update")
    # one emission per touched batch → keep the final (max) state
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n_events"),
                                       F.max("total_cents").alias("tc"))
    return final.select(
        "user_id",
        "n_events",
        (F.col("tc").cast("double") / 100).alias("total_value"),
    )
