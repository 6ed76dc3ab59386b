"""Streaming operators over the `events` table (SURVEY.md §2.4).

The reference is strictly request/response (socket.io appears in its
package.json:32 but is never imported). These are north-star surface,
built on Structured Streaming semantics:

- tumbling / sliding / session windows are declared with the same
  `F.window` / `F.session_window` expressions in batch and streaming —
  Spark guarantees identical results for the windowed aggregation, so
  these run in batch here (oracle-checkable) and
  tests/test_streaming.py pins batch ≡ readStream parity;
- `q_stream_watermark` and `q_stream_dedup` run REAL streams (file
  source → availableNow trigger → memory sink) because their
  semantics — state eviction, append-mode emission,
  dedup-within-watermark — only exist in streaming. Deterministic by
  construction: fixed file splits, fixed watermark delays.

Scale notes: streaming state (session windows, dedup keys) lives in
the state store — at scale use the RocksDB provider
(`session.rocksdb_state_store` flips
`spark.sql.streaming.stateStore.providerClass`; drop-in equality is
pinned in tests/test_streaming.py) and watermark delays
tight enough to bound state; `spark.sql.shuffle.partitions` fixes the
state-store shard count at the first run of a checkpoint.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.operators.aggregates import _osum, dsum
from data_wrangler_spark.registry import register

SCRATCH = "/root/repo/.scratch"


# SQL mirror of Spark's epoch-aligned window start: floor the event
# epoch to the window grid (offset for sliding-window phases).
def _sql_bucket(col: str, seconds: int, offset: int = 0) -> str:
    return (
        f"make_timestamp((CAST(floor((epoch({col}) - {offset}) / {seconds}) AS BIGINT)"
        f" * {seconds} + {offset}) * 1000000)"
    )


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT {_sql_bucket('ts', 300)} AS w_start,
           {_sql_bucket('ts', 300)} + INTERVAL 5 MINUTE AS w_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("stream",),
    minutes=5,
)
def q_stream_tumbling(
    spark: SparkSession, sf_dir: str, minutes: int
) -> DataFrame:
    """Tumbling windows per event type (width in minutes is the
    serving-template parameter; registered default 5 matches the
    oracle). Epoch-aligned starts match the oracle's explicit floor
    arithmetic; the same expression under readStream is pinned equal
    in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{int(minutes)} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH expanded AS (
      SELECT make_timestamp((CAST(floor((epoch(ts) - k) / 600) AS BIGINT) * 600 + k)
                            * 1000000) AS w_start,
             value
      FROM events, (SELECT unnest([0, 300]) AS k) ks)
    SELECT w_start,
           w_start + INTERVAL 10 MINUTE AS w_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
    tags=("stream",),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly
    two windows; the oracle expands the two phase-offsets explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS s_start,
           MAX(ts) + INTERVAL 5 MINUTE AS s_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, sid
    """,
    tags=("stream",),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap
    (session end = last event + gap). The oracle derives identical
    sessions with lag + cumulative-sum — the classic batch
    sessionization — which doubles as the session_window semantics
    spec: a gap ≥ 5 min starts a new session."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# True-streaming runs (file source → availableNow → memory sink)
# ---------------------------------------------------------------------------

def _run_stream(stream_df, query_name: str, output_mode: str = "append") -> DataFrame:
    """Drive a bounded stream to completion synchronously and return
    the sink contents as a batch DataFrame."""
    spark = stream_df.sparkSession
    # The ntz→timestamp→ntz round trip in every streaming builder is a
    # wall-clock identity ONLY at session timeZone=UTC. The engine pins
    # it (session.RUNTIME_CONFS), but apply_runtime_confs is best-
    # effort — on a session whose conf is locked elsewhere, window
    # bounds would silently shift vs the oracle. Fail loudly instead.
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise RuntimeError(
            f"streaming operators require spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): timestamp_ntz round-trips would shift window "
            f"bounds; unlock the conf or set it to UTC before running"
        )
    sink = f"{query_name}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(SCRATCH, "ckpt", sink)
    # The state-store shard count is frozen from shuffle partitions at
    # the first checkpoint; for these bounded few-batch streams, 32
    # shards are pure per-batch maintenance overhead (measured 12.4 s
    # -> 3.7 s on the stream-stream join at 8). Production streams
    # size shards to peak rate BEFORE first launch — this clamp is
    # per-query (fresh checkpoint each run), so it encodes "size to
    # the data", not a global downsize.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    clamp = str(min(int(prev), 8))
    spark.conf.set("spark.sql.shuffle.partitions", clamp)
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # stash the executed micro-batch physical plan so
        # tools/explain_audit.py can pin the stream-static join and
        # state-store shapes in PLANS.md (a memory-sink table's own
        # plan is just a scan — the evidence lives here)
        global _LAST_STREAM_PLAN
        try:
            _LAST_STREAM_PLAN = q._jsq.explainInternal(False)
        except Exception:
            _LAST_STREAM_PLAN = None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


# last executed micro-batch plan, for the plan audit (see _run_stream)
_LAST_STREAM_PLAN: str | None = None


def _ts_bounds(spark: SparkSession, sf_dir: str, ev: DataFrame):
    """(min, max) of events.ts from PARQUET FOOTER STATISTICS — a
    metadata read, not a table scan. The previous form ran a separate
    min/max aggregation job over the source before staging, i.e. a
    second full scan of the stream input per query (VERDICT r3 #7).
    Timestamp column stats are exact (no truncation, unlike strings),
    and footers stay metadata-sized at any SF. Falls back to the
    aggregation scan when the file layout or stats are unavailable.

    load_table (catalog.py) supports a legacy fixture layout where ts
    is physically INT64 epoch-nanos, converted to timestamp on read.
    In that layout the footer stats are plain ints; returning them
    raw would make the caller's ``ev.filter(ts < cut)`` compare a
    timestamp column to a numeric — so int stats are converted to
    datetime here, and anything else non-datetime raises into the
    aggregation fallback (which reads through load_table's converted
    ts and is always type-correct)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    try:
        files = (
            [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
            if os.path.isdir(path)
            else [path]
        )
        mins, maxs = [], []
        for fp in files:
            pf = pq.ParquetFile(fp)
            ci = pf.schema.names.index("ts")
            for rg in range(pf.num_row_groups):
                st = pf.metadata.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("missing ts min/max stats")
                mins.append(st.min)
                maxs.append(st.max)
        if not mins:
            raise ValueError("no row groups")
        lo, hi = min(mins), max(maxs)
        if isinstance(lo, int) and isinstance(hi, int):
            # legacy int64-nanos physical layout: convert to the
            # timestamp type ev's ts column carries after load_table
            lo = _dt.datetime.fromtimestamp(lo // 10**9, _dt.timezone.utc).replace(
                tzinfo=None
            ) + _dt.timedelta(microseconds=(lo % 10**9) // 1000)
            hi = _dt.datetime.fromtimestamp(hi // 10**9, _dt.timezone.utc).replace(
                tzinfo=None
            ) + _dt.timedelta(microseconds=(hi % 10**9) // 1000)
        if not isinstance(lo, _dt.datetime) or not isinstance(hi, _dt.datetime):
            raise ValueError(f"non-datetime ts stats: {type(lo).__name__}")
        return lo, hi
    except Exception:
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        return lo, hi


def _stage_parts(tag_base: str, parts: list) -> str:
    """Stage pre-split DataFrames as one parquet file each, with
    strictly increasing mtimes → deterministic micro-batch order.
    Rebuilds UNCONDITIONALLY: staging is cheap, and any existence-
    based cache here would replay stale fixture bytes against a
    fresh oracle after the source parquet is regenerated (the mtime
    trap every scratch_tag-keyed cache avoids by keying; a stream
    input is rebuilt instead of keyed because its content also
    depends on the split policy of the calling operator)."""
    base = os.path.join(SCRATCH, "stream_in", tag_base)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    for i, p in enumerate(parts):
        tmp = os.path.join(base, f"_tmp{i}")
        p.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(base, f"{i:03d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        # strictly increasing mtimes → deterministic batch order
        ts_file = time.time() + i
        os.utime(dst, (ts_file, ts_file))
    return base


def _staged_events(spark: SparkSession, sf_dir: str, tag: str, n_copies: int = 1,
                   split_frac: float | None = None) -> tuple[str, DataFrame]:
    """Stage the events table into scratch parquet files that a file
    stream will consume as separate micro-batches (one file per
    trigger, ordered by modification time)."""
    ev = load_table(spark, sf_dir, "events")

    parts: list[DataFrame] = []
    if split_frac is not None:
        lo, hi = _ts_bounds(spark, sf_dir, ev)
        cut = lo + (hi - lo) * split_frac
        parts = [ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)]
    else:
        parts = [ev] * n_copies

    base = _stage_parts(
        f"{tag}_{os.path.basename(sf_dir.rstrip('/'))}", parts
    )
    return base, ev


@register(
    "q_stream_watermark",
    oracle=f"""
    WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
    SELECT {_sql_bucket('ts', 300)} AS w_start,
           {_sql_bucket('ts', 300)} + INTERVAL 5 MINUTE AS w_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    HAVING {_sql_bucket('ts', 300)} + INTERVAL 5 MINUTE <= (SELECT w FROM wm)
    """,
    tags=("stream", "stateful"),
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling aggregation under a REAL stream: events
    split at the 80% time point into two files, streamed one file per
    micro-batch. Append mode emits exactly the windows the advancing
    watermark closes; the tail windows stay in state — the
    late-data-bounding behavior this operator exists to pin. The
    emission is deterministic AND SQL-expressible: with availableNow
    + no-data-batch finalization the terminal watermark is
    max(ts) - 10min, so the emitted set is precisely the windows
    whose end ≤ that bound — the oracle's HAVING predicate. The
    tail-retention semantics (windows above the bound withheld) are
    additionally pinned in tests/test_streaming.py."""
    base, ev = _staged_events(spark, sf_dir, "wm", split_frac=0.8)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            F.col("w.end").cast("timestamp_ntz").alias("w_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_stream(stream, "q_stream_watermark")


@register(
    "q_stream_dedup",
    oracle="SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events",
    tags=("stream", "stateful"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: the events table staged TWICE (every row a
    cross-batch duplicate), deduped by event_id with
    dropDuplicatesWithinWatermark. The 35-day delay exceeds the data's
    whole time span, so no dedup state is ever evicted and the result
    is exactly one row per event_id — which is why this streaming-only
    operator still gets a SQL oracle (SELECT * FROM events)."""
    base, ev = _staged_events(spark, sf_dir, "dedup", n_copies=2)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = _run_stream(stream, "q_stream_dedup")
    return out.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props",
    )


@register(
    "q_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    tags=("stream", "join"),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: every purchase within 30 minutes
    after a view by the same user, as a REAL two-source streaming
    join (file source, availableNow, cross-batch matches included).
    Both sides carry a 40-minute watermark; with the interval
    condition Spark bounds join state to [watermark - 30min, now] per
    side, so state is O(rate x window), not O(history). The oracle is
    the exact batch interval self-join — inner stream-stream joins
    emit precisely that set when no input is later than its side's
    watermark (guaranteed here: files are staged in time order with a
    40min > 30min delay). At scale the join shuffles both streams on
    user_id once; skew on hot users is AQE-salted like any batch
    join."""
    base, ev = _staged_events(spark, sf_dir, "sj", split_frac=0.7)

    def side(event_type: str, alias: str) -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(base)
            .filter(F.col("event_type") == event_type)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "40 minutes")
            .alias(alias)
        )

    joined = side("view", "v").join(
        side("purchase", "p"),
        F.expr(
            "v.user_id = p.user_id AND "
            "p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTES"
        ),
    ).select(
        F.col("v.event_id").alias("view_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("p.ts").cast("timestamp_ntz").alias("purchase_ts"),
    )
    return _run_stream(joined, "q_stream_join")


@register(
    "q_stream_left_join",
    oracle="""
    WITH v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'view'),
    p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM p))
                  - INTERVAL 40 MINUTE AS w),
    m AS (
      SELECT v.event_id AS view_id, p.event_id AS purchase_id,
             v.user_id, v.ts AS view_ts, p.ts AS purchase_ts
      FROM v JOIN p ON v.user_id = p.user_id
                   AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE)
    SELECT view_id, purchase_id, user_id, view_ts, purchase_ts FROM m
    UNION ALL
    SELECT v.event_id, CAST(NULL AS BIGINT), v.user_id, v.ts,
           CAST(NULL AS TIMESTAMP)
    FROM v
    WHERE v.event_id NOT IN (SELECT view_id FROM m)
      AND v.ts + INTERVAL 30 MINUTE <= (SELECT w FROM wm)
    """,
    tags=("stream", "join"),
)
def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view, paired
    with each purchase by the same user within the next 30 minutes,
    or with NULLs once the watermark PROVES no such purchase can
    still arrive. This is the semantics inner joins can't express —
    'did NOT convert' is only decidable after the watermark passes
    view_ts + 30min, so null rows emit late, from evicted state.
    The emission is deterministic AND SQL-expressible: matches are
    the full inner-join set, and with availableNow + no-data-batch
    finalization the terminal watermark is
    min(max view_ts, max purchase_ts) - 40min, so the emitted null
    rows are exactly the unmatched views whose no-match proof
    completed (view_ts + 30min ≤ that bound) — views closer to the
    end of input stay withheld, which the oracle's predicate
    reproduces. Scale notes are q_stream_join's: state bounded to
    the watermark horizon per side, shuffled once on user_id."""
    base, ev = _staged_events(spark, sf_dir, "slj", split_frac=0.7)

    def side(event_type: str, alias: str) -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(base)
            .filter(F.col("event_type") == event_type)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "40 minutes")
            .alias(alias)
        )

    joined = side("view", "v").join(
        side("purchase", "p"),
        F.expr(
            "v.user_id = p.user_id AND "
            "p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select(
        F.col("v.event_id").alias("view_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("p.ts").cast("timestamp_ntz").alias("purchase_ts"),
    )
    return _run_stream(joined, "q_stream_left_join")


@register(
    "q_stream_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, e.value,
           c.c_nationkey, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("stream", "join"),
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the
    customer dimension (a plain batch DataFrame) per micro-batch.
    This is THE canonical streaming-ETL shape — dimension lookup on
    a moving fact stream. The static side broadcasts into every
    micro-batch (no state, no watermark needed for an inner
    non-aggregating join; output is append-mode row-per-match). At
    scale, refresh the dim by re-resolving the batch DataFrame per
    trigger (foreachBatch) or use a slowly-changing broadcast; the
    stream side itself never shuffles."""
    base, ev = _staged_events(spark, sf_dir, "enrich", split_frac=0.6)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .select(
            "event_id", "user_id", "event_type", "value",
            "c_nationkey", "c_mktsegment",
        )
    )
    return _run_stream(stream, "q_stream_enrich")


@register(
    "q_stream_sink_parquet",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type <> 'view'
    """,
    tags=("stream", "sink"),
)
def q_stream_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parquet sink through foreachBatch: each micro-batch
    appends to a parquet directory under the stream's checkpoint
    guard — the restart-safe pattern for custom sinks (foreachBatch
    re-delivers a failed batch; the batchId lets a real sink
    implement idempotent upsert). The returned DataFrame re-reads
    the sink files, so the oracle checks bytes-through-the-sink, not
    just the in-memory stream: filter semantics, append atomicity,
    and schema fidelity all round-trip. At scale the same pattern
    fans out to partitioned-by-date layouts; compaction is a
    downstream concern."""
    base, ev = _staged_events(spark, sf_dir, "sink", split_frac=0.5)
    out = os.path.join(SCRATCH, "sink_out", f"pq_{uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(SCRATCH, "ckpt", f"sink_{uuid.uuid4().hex[:8]}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.filter(F.col("event_type") != "view")
            .select("event_id", "user_id", "event_type", "value")
            .write.mode("append")
            .parquet(out)
        )

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@register(
    "q_stream_upsert_state",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id AS last_event_id,
           event_type AS last_event_type, ts AS last_ts
    FROM ranked WHERE rn = 1
    """,
    tags=("stream", "sink", "stateful"),
)
def q_stream_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT through foreachBatch: the canonical
    'materialized latest-row-per-key table' sink. Events stream in
    two micro-batches; each batch merges into the persisted state as
    union(previous state, batch) → keep ROW_NUMBER()=1 per user by
    (ts, event_id) DESC — written to a NEW versioned directory per
    batchId, so a re-delivered batch (foreachBatch's at-least-once
    contract) simply rewrites the same version: idempotent by
    construction, no partial-overwrite window. The returned frame
    reads the final version from disk; the oracle computes
    latest-per-user over the whole table — batch boundaries must not
    change the answer (upsert is associative), and the full tiebreak
    makes 'latest' engine-independent. At 100 TB the state table is
    key-partitioned and each merge touches only the partitions a
    batch's keys hash to (or becomes MERGE INTO on a lakehouse
    table); the merge-then-swap-version shape here is that same
    pattern with the directory as the transaction boundary."""
    from pyspark.sql import Window as W

    base, ev = _staged_events(spark, sf_dir, "upsert", split_frac=0.5)
    state_root = os.path.join(SCRATCH, "upsert_state", uuid.uuid4().hex[:8])
    os.makedirs(state_root, exist_ok=True)
    latest: dict[str, str | None] = {"path": None}

    cols = ["user_id", "last_event_id", "last_event_type", "last_ts"]
    rn_w = W.partitionBy("user_id").orderBy(
        F.col("last_ts").desc(), F.col("last_event_id").desc()
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
        )
        if latest["path"] is not None:
            prev = batch_df.sparkSession.read.parquet(latest["path"])
            incoming = prev.unionByName(incoming)
        merged = (
            incoming.withColumn("rn", F.row_number().over(rn_w))
            .filter(F.col("rn") == 1)
            .select(*cols)
        )
        vdir = os.path.join(state_root, f"v{batch_id:05d}")
        merged.write.mode("overwrite").parquet(vdir)
        latest["path"] = vdir

    ckpt = os.path.join(SCRATCH, "ckpt", f"upsert_{uuid.uuid4().hex[:8]}")
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert latest["path"] is not None
    return spark.read.parquet(latest["path"])


@register(
    "q_stream_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {_osum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("stream", "sink", "stateful"),
)
def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING materialized aggregate — the streaming twin of
    q_rollup_incremental and the third member of the maintenance
    family (batch-append rollup, streaming upsert, streaming
    rollup): each micro-batch reduces to hourly partials (count +
    exact decimal sum, both mergeable), which MERGE into the
    persisted rollup state by union + re-aggregate, written to a new
    versioned directory per batchId. Redelivery-idempotence needs
    more care than the upsert sink: an additive merge would
    double-count a replayed batch if it merged against 'the latest'
    state, so the merge source is always the highest ON-DISK version
    strictly below the incoming batchId — a replayed batch b rebuilds
    v{b} from v{b-1} bit-identically, and a restarted driver resumes
    from disk rather than a reset in-memory pointer. Serving reads the final version and folds
    hours to days; the oracle recomputes from raw events, so a hash
    match proves the continuous view ≡ the batch truth regardless
    of how the stream was chopped into batches — the associativity
    argument made empirical.

    At 100 TB this is how dashboards stay current: per-batch partial
    state is |hours×types| touched by that batch, the merge touches
    only those partitions, and nothing ever re-reads the event log.
    RocksDB-state windowed aggregation (q_stream_tumbling) solves
    the same problem engine-side; this foreachBatch form is what you
    use when the VIEW must live in an external table."""
    base, ev = _staged_events(spark, sf_dir, "rollup", split_frac=0.5)
    state_root = os.path.join(SCRATCH, "rollup_state", uuid.uuid4().hex[:8])
    os.makedirs(state_root, exist_ok=True)

    def _version_before(batch_id: int) -> str | None:
        # merge source comes from DISK, strictly below this batch id:
        # an additive merge is only redelivery-idempotent if a
        # replayed batch b rebuilds v{b} from v{b-1} — reading "the
        # latest" would re-add b's own partials (and an in-memory
        # pointer would silently reset to None across a driver
        # restart while the checkpoint skips completed batches)
        versions = sorted(
            (
                e.name
                for e in os.scandir(state_root)
                if e.name.startswith("v") and int(e.name[1:]) < batch_id
                and os.path.exists(os.path.join(state_root, e.name, "_SUCCESS"))
            ),
            key=lambda n: int(n[1:]),  # numeric — lexical breaks past v99999
        )
        return os.path.join(state_root, versions[-1]) if versions else None

    from data_wrangler_spark.operators.quality_ts import hourly_partials

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # the SAME mergeable-partial definition as the batch rollups
        # (quality_ts.hourly_partials) — stream merge and batch
        # increment provably aggregate identical state
        partials = hourly_partials(batch_df)
        prev_path = _version_before(batch_id)
        if prev_path is not None:
            prev = batch_df.sparkSession.read.parquet(prev_path)
            partials = prev.unionByName(partials)
        merged = partials.groupBy("bucket", "day", "event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
        )
        vdir = os.path.join(state_root, f"v{batch_id:05d}")
        merged.write.mode("overwrite").parquet(vdir)

    ckpt = os.path.join(SCRATCH, "ckpt", f"rollup_{uuid.uuid4().hex[:8]}")
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = _version_before(10**9)
    assert final is not None
    rollup = spark.read.parquet(final)
    return rollup.groupBy("day", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_dec").cast("double").alias("sum_value"),
    )


def _stream_decontam_oracle() -> str:
    from data_wrangler_spark.functions.text import sql_shingles_of, sql_words
    from data_wrangler_spark.operators.dedup import INC_EXIST_PCT
    from data_wrangler_spark.operators.pipeline_ops import (
        CONTAM_EVAL_SOURCE,
        CONTAM_NGRAM,
    )

    return f"""
    WITH toks AS (
        SELECT doc_id, source, {sql_words('text')} AS w FROM documents),
    evset AS (
        SELECT DISTINCT g FROM (
          SELECT unnest({sql_shingles_of('w', CONTAM_NGRAM)}) AS g
          FROM toks WHERE source = '{CONTAM_EVAL_SOURCE}')),
    tr AS (
        SELECT doc_id, source,
               unnest({sql_shingles_of('w', CONTAM_NGRAM)}) AS g
        FROM toks
        WHERE source <> '{CONTAM_EVAL_SOURCE}'
          AND doc_id % 10 >= {INC_EXIST_PCT})
    SELECT DISTINCT doc_id, source
    FROM tr WHERE g IN (SELECT g FROM evset)
    """


@register(
    "q_stream_decontaminate",
    oracle=_stream_decontam_oracle(),
    tags=("stream", "llm", "contamination"),
)
def q_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest decontamination — the q_contamination_incremental
    gate run AS the ingest stream it is designed for: documents arrive
    as a file stream (two micro-batches), each new train doc explodes
    into its word 5-grams, a STREAM-STATIC LEFT-SEMI join probes the
    persisted eval-gram index (the static side — broadcast into every
    micro-batch, no state), and stateful dropDuplicates collapses the
    surviving gram hits to one flagged row per document. Output: the
    doc_ids a production ingest would QUARANTINE, emitted as they
    stream past the gate. Runs a REAL stream (file source →
    availableNow → memory sink); the oracle replays the same flag set
    from raw text, so the persisted-index hop and the streaming
    emission are both value-checked.

    Scale: the static gram index is eval-sized (tiny — broadcasts; at
    100 TB, q_contamination_bloom's measured Bloom filter with this
    exact form as the audit path);
    the stream side never shuffles before the dedup, whose state is
    one key per FLAGGED doc — bounded by leakage volume, not corpus.
    This is the gate q_corpus_pipeline_incremental applies in batch
    (stage 2.5), here proven to compose with Structured Streaming
    delivery."""
    from data_wrangler_spark.functions.text import shingles_from_words, words
    from data_wrangler_spark.operators.dedup import INC_EXIST_PCT
    from data_wrangler_spark.operators.pipeline_ops import (
        CONTAM_EVAL_SOURCE,
        CONTAM_NGRAM,
        ensure_contam_index,
    )

    evset = ensure_contam_index(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # two deterministic halves by doc_id parity → two micro-batches;
    # staged via the shared helper (rebuilds each run — no stale cache)
    base = _stage_parts(
        f"decontam_{os.path.basename(sf_dir.rstrip('/'))}",
        [
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ],
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .filter(
            (F.col("source") != CONTAM_EVAL_SOURCE)
            & (F.col("doc_id") % 10 >= INC_EXIST_PCT)
        )
        .select(
            "doc_id",
            "source",
            F.explode(
                shingles_from_words(words("text"), CONTAM_NGRAM)
            ).alias("g"),
        )
        .join(evset, "g", "left_semi")
        .select("doc_id", "source")
        .dropDuplicates(["doc_id"])
    )
    return _run_stream(stream, "q_stream_decontaminate")





def _stream_dedup_ingest_oracle() -> str:
    # the batch incremental dedup oracle (dedup._inc_oracle) already
    # replays index build + probe + exact-Jaccard verify from raw
    # text; the stream emits the same pairs without the band count
    # (a per-pair band aggregation is a streaming groupBy this gate
    # deliberately avoids — state stays one key per FLAGGED pair)
    from data_wrangler_spark.operators.dedup import _inc_oracle

    return (
        "SELECT doc_new, doc_old, jac_micro FROM (" + _inc_oracle() + ")"
    )


@register(
    "q_stream_dedup_ingest",
    oracle=_stream_dedup_ingest_oracle(),
    tags=("stream", "llm", "dedup"),
)
def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ingest gate — q_dedup_incremental's
    persisted LSH band index probed AS the ingest stream it is
    designed for (the q_stream_decontaminate pattern applied to the
    dedup family, closing the matrix: every stage-2 gate now has a
    proven streaming delivery). New documents arrive as a file
    stream (two micro-batches, doc_id parity split); each doc is
    minhash-signed PER ROW by dedup.sig_expr (one expression tree —
    no persist barrier, batch-parity pinned by pytest), banded, and
    a STREAM-STATIC equi-join probes the persisted band-key (fmt=l4)
    index built once by dedup.ensure_inc_index. Candidates verify by
    exact shingle Jaccard against the static history shingle sets,
    and stateful dropDuplicates emits each verified pair once.
    Output: (doc_new, doc_old, jac_micro) — the duplicates a
    production ingest would QUARANTINE, emitted as they stream past
    the gate. Runs a REAL stream (file source → availableNow →
    memory sink); the oracle replays index build + probe + verify
    from raw text, so the persisted hop AND the streaming emission
    are both value-checked, and pytest pins the streamed pair set ≡
    the batch q_dedup_incremental's.

    Scale: the static index side is (band, k0..k3, doc_id) — bytes
    per history doc, not text; band-partitioned so each probe prunes
    to its band. The verify side joins the candidate doc_olds'
    shingle sets read from the PERSISTED shingle table written
    beside the band index at build time (inc_index_shingles) —
    a probe run never re-shingles history text. A pair can
    match on up to N_BANDS buckets, so verify work is duplicated at
    most ×4 before the stateful dedup — the deliberate trade that
    keeps state bounded by VERIFIED duplicates (leakage volume), not
    by candidates or corpus. ingest cost stays O(new batch +
    candidates) per micro-batch, the q_dedup_incremental property,
    now demonstrated under Structured Streaming delivery."""
    from data_wrangler_spark.functions.text import shingles_from_words, words
    from data_wrangler_spark.operators.dedup import (
        BAND_KEY,
        INC_EXIST_PCT,
        INC_JAC_MICRO,
        _band_table,
        ensure_inc_index,
        inc_index_shingles,
        sig_expr,
    )

    index_g = ensure_inc_index(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 >= INC_EXIST_PCT)
    base = _stage_parts(
        f"dedup_ingest_{os.path.basename(sf_dir.rstrip('/'))}",
        [
            new.filter(F.col("doc_id") % 2 == 0),
            new.filter(F.col("doc_id") % 2 == 1),
        ],
    )

    # static verify side: the history shingle sets PERSISTED beside
    # the band index (the stream side's set rides the stream row) —
    # no per-run re-shingle of history text; the run pays one
    # columnar scan of stored shingle bytes. persist() so the SECOND
    # and later micro-batches reuse the decoded arrays instead of
    # re-decoding the parquet per trigger (measured: unpinned, each
    # trigger re-decodes + rebuilds the broadcast from disk)
    from data_wrangler_spark.functions.distributed import pin

    shd_old = pin(
        inc_index_shingles(spark, sf_dir)
        .select(F.col("doc_id").alias("doc_old"), "sb")
        .persist()
    )

    sigs = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .select(
            "doc_id", shingles_from_words(words("text"), 3).alias("sh")
        )
        .select(
            "doc_id",
            sig_expr(F.col("sh")).alias("sig"),
            F.array_distinct("sh").alias("sa"),
        )
    )
    # size() is int32 — promote before the ×1e6 (ANSI overflow trap)
    ni = F.size(F.array_intersect("sa", "sb")).cast("long")
    stream = (
        # compact band keys (r17): the stream-static probe joins on
        # the 4 raw minhash longs, matching the fmt=l4 index
        _band_table(sigs, carry=("sa",), compact=True)
        .join(index_g.withColumnRenamed("doc_id", "doc_old"), list(BAND_KEY))
        .join(shd_old, "doc_old")
        .withColumn("_ni", ni)
        .select(
            F.col("doc_id").alias("doc_new"),
            "doc_old",
            F.expr(
                "div(_ni * 1000000, "
                "cast(size(sa) as bigint) + size(sb) - _ni)"
            ).alias("jac_micro"),
        )
        .filter(F.col("jac_micro") >= INC_JAC_MICRO)
        .dropDuplicates(["doc_new", "doc_old"])
    )
    return _run_stream(stream, "q_stream_dedup_ingest")


def _stream_quarantine_oracle() -> str:
    # union of the two gates' replay SQL: the dedup gate quarantines
    # the NEW doc of each verified pair; the contamination gate each
    # leaky train doc. DISTINCT per (doc, reason) mirrors the
    # stream's per-key emission.
    from data_wrangler_spark.operators.dedup import _inc_oracle

    return f"""
    SELECT DISTINCT doc_id, reason FROM (
      SELECT doc_new AS doc_id, 'near_dup' AS reason
      FROM ({_inc_oracle()})
      UNION ALL
      SELECT doc_id, 'contaminated' AS reason
      FROM ({_stream_decontam_oracle()})
    )
    """


@register(
    "q_stream_quarantine",
    oracle=_stream_quarantine_oracle(),
    tags=("stream", "llm", "dedup", "contamination"),
)
def q_stream_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified QUARANTINE stream — both ingest gates in ONE
    Structured Streaming job: each arriving document is probed
    against the persisted LSH band index (near-dup gate,
    q_stream_dedup_ingest's plan) AND the persisted eval-gram index
    (contamination gate, q_stream_decontaminate's plan); a doc
    failing either gate is emitted once per failed gate as
    (doc_id, reason ∈ {{'near_dup', 'contaminated'}}). This is the
    operational shape of a production ingest: one stream in, one
    quarantine topic out, reasons attached for triage. Built as a
    self-union of the same file-stream source — Spark runs the two
    gate subplans over the shared micro-batch; state =
    dropDuplicates keys per (doc, reason), bounded by quarantine
    volume. Exact oracle: union of the two gates' raw-text replays.

    Scale: inherits each gate's properties unchanged (band-index
    equi-join with the micro-batch broadcast; eval-gram semi-join
    with the eval-sized static side broadcast; verify only on
    candidates). The union adds no shuffle of its own — the two
    branches partition by their own state keys and append to one
    sink. At 100 TB the reasons column is what routes docs to
    re-review vs hard-drop."""
    from data_wrangler_spark.operators.dedup import INC_EXIST_PCT

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    new = docs.filter(F.col("doc_id") % 10 >= INC_EXIST_PCT)
    base = _stage_parts(
        f"quarantine_{os.path.basename(sf_dir.rstrip('/'))}",
        [
            new.filter(F.col("doc_id") % 2 == 0),
            new.filter(F.col("doc_id") % 2 == 1),
        ],
    )
    # trigger width is env-parameterized (VERDICT r16 #8): the default
    # of 1 file per trigger keeps the 2-micro-batch shape the resume
    # proof pins (tests drive quarantine_gate_plan across a restart),
    # while SPARK_GRAFT_STREAM_TRIGGER_FILES=2 runs the same plan in
    # ONE wider micro-batch — the production trigger that amortizes
    # the fixed per-batch cost (planning + state store round-trip)
    # over more rows. Output is identical either way: both gates are
    # stateless per row and dropDuplicates is batch-boundary-blind
    # (pinned by tests/test_streaming.py).
    trigger_files = int(
        os.environ.get("SPARK_GRAFT_STREAM_TRIGGER_FILES", "1")
    )
    src = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", trigger_files
    ).parquet(base)
    return _run_stream(
        quarantine_gate_plan(spark, sf_dir, src), "q_stream_quarantine"
    )


def quarantine_gate_plan(
    spark: SparkSession, sf_dir: str, src: DataFrame
) -> DataFrame:
    """Both ingest gates applied to an arriving-docs stream `src`
    (doc_id, source, text) → the quarantine flags stream
    (doc_id, reason). Factored out of q_stream_quarantine so the
    restart/resume test (tests/test_streaming.py) can drive the SAME
    plan across two invocations of a DURABLE checkpoint — production
    ingest restarts daily; the gate logic must not care which run of
    the query a document arrives in (VERDICT r11 #2)."""
    from data_wrangler_spark.functions.text import shingles_from_words, words
    from data_wrangler_spark.operators.dedup import (
        BAND_KEY,
        INC_JAC_MICRO,
        _band_table,
        ensure_inc_index,
        inc_index_shingles,
        sig_expr,
    )
    from data_wrangler_spark.operators.pipeline_ops import (
        CONTAM_EVAL_SOURCE,
        CONTAM_NGRAM,
        ensure_contam_index,
    )

    index_g = ensure_inc_index(spark, sf_dir)
    evset = ensure_contam_index(spark, sf_dir)

    # history shingle sets from the PERSISTED table beside the band
    # index — no per-run history re-shingle; pinned so later triggers
    # reuse the decoded arrays (see q_stream_dedup_ingest)
    from data_wrangler_spark.functions.distributed import pin

    shd_old = pin(
        inc_index_shingles(spark, sf_dir)
        .select(F.col("doc_id").alias("doc_old"), "sb")
        .persist()
    )

    # gate 1: near-dup (q_stream_dedup_ingest's plan, doc_id only)
    sigs = src.select(
        "doc_id", shingles_from_words(words("text"), 3).alias("sh")
    ).select(
        "doc_id",
        sig_expr(F.col("sh")).alias("sig"),
        F.array_distinct("sh").alias("sa"),
    )
    ni = F.size(F.array_intersect("sa", "sb")).cast("long")
    dup_flags = (
        # compact band keys (r17): probe on the 4 raw minhash longs
        _band_table(sigs, carry=("sa",), compact=True)
        .join(index_g.withColumnRenamed("doc_id", "doc_old"), list(BAND_KEY))
        .join(shd_old, "doc_old")
        .withColumn("_ni", ni)
        .filter(
            F.expr(
                "div(_ni * 1000000, "
                "cast(size(sa) as bigint) + size(sb) - _ni)"
            )
            >= INC_JAC_MICRO
        )
        .select("doc_id", F.lit("near_dup").alias("reason"))
    )

    # gate 2: contamination (q_stream_decontaminate's plan)
    contam_flags = (
        src.filter(F.col("source") != CONTAM_EVAL_SOURCE)
        .select(
            "doc_id",
            F.explode(
                shingles_from_words(words("text"), CONTAM_NGRAM)
            ).alias("g"),
        )
        .join(evset, "g", "left_semi")
        .select("doc_id", F.lit("contaminated").alias("reason"))
    )

    return dup_flags.unionByName(contam_flags).dropDuplicates(
        ["doc_id", "reason"]
    )


def _stream_embed_gate_oracle() -> str:
    # the batch incremental embedding-dedup oracle replays the
    # history-only fit, both assignments, and the cosines from raw
    # embeddings; the stream emits exactly those pairs
    from data_wrangler_spark.operators.dedup import _embed_inc_oracle

    return _embed_inc_oracle()


@register(
    "q_stream_embed_gate",
    oracle=_stream_embed_gate_oracle(),
    tags=("stream", "llm", "dedup", "embedding"),
)
def q_stream_embed_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SEMANTIC near-dup gate — q_dedup_embed_incremental's
    persisted vector index probed AS the ingest stream it is designed
    for, completing the streaming-delivery matrix across all the
    incremental dedup families (text LSH: q_stream_dedup_ingest;
    grams: q_stream_decontaminate; embeddings: this). New vectors
    arrive as a file stream (two micro-batches, vec_id parity split);
    each row is quantized and assigned to its nearest FROZEN
    history-fit centroid by ONE codegen expression
    (embeddings_ext.assign_cell_expr — the K×dim matrix rides the
    plan as a SQL-parsed literal; no Arrow barrier, no shuffle,
    batch-parity with kmeans_assign_mat pinned by pytest), then a
    STREAM-STATIC equi-join on cell against the persisted history
    members verifies exact cosine ≥ SEM_TAU, and stateful
    dropDuplicates emits each verified pair once as (vec_new,
    vec_old, cell, cos_sim). The oracle replays fit + assignments +
    cosines from raw embeddings (the batch q_dedup_embed_incremental
    oracle), so the persisted index AND the streaming emission are
    both value-checked; pytest pins the streamed pair set ≡ the batch
    op's. The pair cosine is the batch op's Arrow dot
    (make_dot_udf + round6) — NOT the unrolled 64-dim expression,
    which exceeds HotSpot's JIT bytecode limit and runs interpreted
    on the per-pair hot path (make_dot_udf's docstring; re-measured
    here: 29.4 s → 3.6 s warm per run at f5 when the expression dot
    was swapped out).

    Scale: per micro-batch the work is O(batch + same-cell pairs) —
    assignment is embarrassingly row-local (the KB-sized centroid
    literal is part of the plan), and the static side joins only the
    batch's cells. Here the members table rides unpartitioned (it is
    |history| rows of vectors); at 100 TB it lives CELL-PARTITIONED
    (the layout q_dedup_embed_2day writes and q_sim_search_ivf_indexed
    serves from), so each micro-batch's join prunes to its cells'
    files. State is one key per EMITTED pair (~bytes each), bounded
    by leakage volume, never corpus size — the q_stream_dedup_ingest
    property, inherited."""
    from data_wrangler_spark.functions.distributed import pin
    from data_wrangler_spark.functions.vectors import (
        make_dot_udf,
        norm,
        round6,
        to_double_array,
    )
    from data_wrangler_spark.operators.dedup import (
        INC_EXIST_PCT,
        SEM_TAU,
        ensure_embed_inc_index,
    )
    from data_wrangler_spark.operators.embeddings_ext import (
        assign_cell_expr,
        quantize_expr,
    )

    cl_ids, cmat, members = ensure_embed_inc_index(spark, sf_dir)
    raw = load_table(spark, sf_dir, "embeddings")

    new = raw.filter(F.col("vec_id") % 10 >= INC_EXIST_PCT).select(
        "vec_id", "embedding"
    )
    base = _stage_parts(
        f"embed_gate_{os.path.basename(sf_dir.rstrip('/'))}",
        [
            new.filter(F.col("vec_id") % 2 == 0),
            new.filter(F.col("vec_id") % 2 == 1),
        ],
    )

    # static side: history members with precomputed norms; pinned so
    # later micro-batches reuse the decoded arrays (see
    # q_stream_dedup_ingest). MAX_CELL sub-split arity comes from the
    # static index side, exactly as in the batch twin.
    from data_wrangler_spark.operators.dedup import _cell_subs, _with_sub

    subs = _cell_subs(members)
    b = pin(
        _with_sub(members, subs, "e")
        .select(
            F.col("vec_id").alias("vec_old"),
            "cell",
            "sub",
            F.col("e").alias("eb"),
            norm(F.col("e")).alias("nb"),
        )
        .persist()
    )

    a = _with_sub(
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .select(
            F.col("vec_id").alias("vec_new"),
            to_double_array("embedding").alias("ea"),
            quantize_expr(F.col("embedding")).alias("xs"),
        )
        .withColumn("cell", assign_cell_expr(cl_ids, cmat).cast("int"))
        .withColumn("na", norm(F.col("ea")))
        .drop("xs"),
        subs,
        "ea",
    )
    dot_udf = make_dot_udf()
    stream = (
        a.join(b, ["cell", "sub"])
        .withColumn(
            "cos_sim",
            round6(
                dot_udf(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ),
        )
        .filter(F.col("cos_sim") >= SEM_TAU)
        .select("vec_new", "vec_old", "cell", "cos_sim")
        .dropDuplicates(["vec_new", "vec_old"])
    )
    return _run_stream(stream, "q_stream_embed_gate")


def _stream_dsir_oracle() -> str:
    from data_wrangler_spark.functions.text import sql_bigrams_of, sql_words
    from data_wrangler_spark.operators.dedup import INC_EXIST_PCT, _sql_md5_long
    from data_wrangler_spark.operators.llm_extras import DSIR_B, DSIR_TARGET_LANG

    bkt = f"({_sql_md5_long('gram')} % {DSIR_B})"
    return f"""
    WITH w AS (SELECT doc_id, lang = '{DSIR_TARGET_LANG}' AS is_target,
                      {sql_words('text')} AS w
               FROM documents),
    g AS (SELECT doc_id, is_target,
                 unnest({sql_bigrams_of('w')}) AS gram
          FROM w),
    b AS (SELECT doc_id, is_target, {bkt} AS bkt FROM g),
    cb AS (SELECT bkt,
                  CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                    AS ct,
                  CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT)
                    AS cr
           FROM b
           WHERE doc_id % 10 < {INC_EXIST_PCT}
           GROUP BY 1),
    tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                   CAST(SUM(cr) AS BIGINT) AS nr
            FROM cb),
    lw AS (SELECT cb.bkt,
                  CAST(floor(CAST(CAST(ln(
                      (CAST(cb.ct + 1 AS DOUBLE) * CAST(tot.nr + {DSIR_B} AS DOUBLE))
                    / (CAST(cb.cr + 1 AS DOUBLE) * CAST(tot.nt + {DSIR_B} AS DOUBLE))
                  ) AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT) AS lw_micro
           FROM cb CROSS JOIN tot),
    dflt AS (SELECT CAST(floor(CAST(CAST(ln(
                      CAST(tot.nr + {DSIR_B} AS DOUBLE)
                    / CAST(tot.nt + {DSIR_B} AS DOUBLE)
                  ) AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT) AS d
             FROM tot),
    scored AS (SELECT b.doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_grams,
                      CAST(SUM(COALESCE(lw.lw_micro, dflt.d)) AS BIGINT)
                        AS sum_lw_micro
               FROM b LEFT JOIN lw USING (bkt) CROSS JOIN dflt
               WHERE b.doc_id % 10 >= {INC_EXIST_PCT}
               GROUP BY 1)
    SELECT s.doc_id, d.lang = '{DSIR_TARGET_LANG}' AS is_target,
           s.n_grams, s.sum_lw_micro,
           CAST(floor(CAST(s.sum_lw_micro AS DOUBLE) / s.n_grams) AS BIGINT)
             AS avg_lw_micro,
           (CAST(floor(CAST(s.sum_lw_micro AS DOUBLE) / s.n_grams) AS BIGINT)
             > 0) AS selected
    FROM scored s JOIN documents d USING (doc_id)
    """


@register(
    "q_stream_dsir_gate",
    oracle=_stream_dsir_oracle(),
    tags=("stream", "llm", "selection"),
)
def q_stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR selection gate — q_dsir_select's importance
    estimator served AS the ingest stream it is designed for,
    extending the streaming-delivery matrix beyond dedup and
    contamination to data SELECTION: the bucket weight table is fit
    batch-side on the HISTORY split (doc_id % 10 < INC_EXIST_PCT, the
    incremental families' convention), and new documents are scored as
    they stream past. The weight table is the gate's whole index — the
    FULL DSIR_B-vector including the smoothing default for buckets the
    fit never saw (llm_extras.dsir_weight_vector; engine-side
    arithmetic, so the ints match the oracle's) — and at DSIR_B longs
    (~8 KB) it rides the plan as ONE SQL-parsed array literal (the
    assign_cell_expr lesson: per-element lit construction would pay
    thousands of py4j calls). Scoring is then a single codegen
    projection per row: hash each bigram, element_at into the weight
    vector, integer-sum — no Arrow barrier, NO stream-static join, NO
    stateful operator. Output per streamed doc: (doc_id, is_target,
    n_grams, sum_lw_micro, avg_lw_micro, selected). Runs a REAL
    stream (file source, two doc_id-parity micro-batches →
    availableNow → memory sink); the oracle replays fit, default, and
    scoring from raw text, and pytest pins the streamed rows ≡ the
    same scoring run batch-side.

    Scale: this is the family's best-case streaming shape — the gate
    holds ZERO state bytes (pure per-row projection, the
    q_stream_pii_scrub property) and the fit artifact is O(DSIR_B),
    independent of corpus size, so refitting and re-broadcasting it
    is free at any scale; ingest cost is exactly O(new tokens) per
    micro-batch with no exchange at all."""
    from data_wrangler_spark.functions.text import bigrams_from_words, words
    from data_wrangler_spark.operators.dedup import INC_EXIST_PCT, _md5_long
    from data_wrangler_spark.operators.llm_extras import (
        DSIR_B,
        DSIR_TARGET_LANG,
        dsir_weight_vector,
    )

    vec = dsir_weight_vector(
        spark, sf_dir, F.col("doc_id") % 10 < INC_EXIST_PCT
    )
    lw_lit = F.expr("array(" + ",".join(f"{v}L" for v in vec) + ")")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
        "text",
    )
    new = docs.filter(F.col("doc_id") % 10 >= INC_EXIST_PCT)
    base = _stage_parts(
        f"dsir_gate_{os.path.basename(sf_dir.rstrip('/'))}",
        [
            new.filter(F.col("doc_id") % 2 == 0),
            new.filter(F.col("doc_id") % 2 == 1),
        ],
    )

    def bucket_of(g):
        # same estimator expression as the batch side and the oracle:
        # all three scoring paths go through _md5_long so the stream
        # gate can never drift onto a different bucket function
        return (_md5_long(g) % DSIR_B).cast("int")

    avg = F.floor(
        F.col("sum_lw_micro").cast("double") / F.col("n_grams")
    ).cast("long")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .select(
            "doc_id",
            "is_target",
            bigrams_from_words(words("text")).alias("grams"),
        )
        .filter(F.size("grams") > 0)
        .select(
            "doc_id",
            "is_target",
            F.size("grams").cast("long").alias("n_grams"),
            F.aggregate(
                F.transform(
                    "grams", lambda g: F.element_at(lw_lit, bucket_of(g) + 1)
                ),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            ).alias("sum_lw_micro"),
        )
        .withColumn("avg_lw_micro", avg)
        .withColumn("selected", avg > 0)
    )
    return _run_stream(stream, "q_stream_dsir_gate")


def _run_stream_to_dir(stream_df, out: str, ckpt: str) -> None:
    """Drive a bounded stream to completion into a DURABLE parquet
    sink + checkpoint (the restart-capable counterpart of
    _run_stream's fresh memory sink). Same UTC guard and state-shard
    clamp discipline; exactly-once delivery comes from the file
    sink's own commit log, resumability from the checkpoint."""
    spark = stream_df.sparkSession
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise RuntimeError(
            f"streaming operators require spark.sql.session.timeZone=UTC "
            f"(got {tz!r})"
        )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(min(int(prev), 8)))
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        global _LAST_STREAM_PLAN
        try:
            _LAST_STREAM_PLAN = q._jsq.explainInternal(False)
        except Exception:
            _LAST_STREAM_PLAN = None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@register(
    "q_stream_quarantine_resume",
    oracle=_stream_quarantine_oracle(),
    tags=("stream", "llm", "dedup", "contamination"),
)
def q_stream_quarantine_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine gate delivered across a RESTART — the daily
    production shape, driver-checked: run 1 of the stream processes
    only day-1's file against a DURABLE checkpoint and an
    exactly-once parquet sink, then day-2's file lands and a SECOND
    invocation of the same query resumes from that checkpoint — the
    source log skips day-1's already-committed file, dropDuplicates
    state is restored, and the sink's commit log forbids
    re-emission. The returned rows are the SINK's accumulated
    contents, and the oracle is q_stream_quarantine's single-run
    replay — i.e. the checked claim is precisely exactly-once:
    restart boundaries must be invisible in the emitted data. (The
    same property is pinned procedurally, with per-run input-row
    counts and under RocksDB, by tests/test_streaming.py's
    restart/resume test; this entry puts it under the driver's
    value-hash gate.)

    Scale: nothing new over q_stream_quarantine's per-gate plans —
    the only addition is durability (checkpoint + file-sink log),
    which is how a 100 TB ingest actually runs: one long-lived
    checkpoint, restarted daily, each restart paying only the new
    files. Scratch is keyed on fixture + split constants and
    self-heals (a missing _DONE rebuilds from scratch)."""
    import shutil as _sh
    import time as _time

    from data_wrangler_spark.catalog import scratch_tag
    from data_wrangler_spark.operators.dedup import INC_EXIST_PCT

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    new = docs.filter(F.col("doc_id") % 10 >= INC_EXIST_PCT)

    root = os.path.join(
        SCRATCH,
        "stream_resume",
        scratch_tag(sf_dir, "documents", f"exist={INC_EXIST_PCT},split=2,v1"),
    )
    src_dir = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")

    def stage(df, name: str, bump: int) -> None:
        tmp = os.path.join(root, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(src_dir, name)
        _sh.move(os.path.join(tmp, part), dst)
        _sh.rmtree(tmp, ignore_errors=True)
        ts = _time.time() + bump
        os.utime(dst, (ts, ts))

    def run_once() -> None:
        src = (
            spark.readStream.schema(new.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        _run_stream_to_dir(quarantine_gate_plan(spark, sf_dir, src), out, ckpt)

    if not os.path.exists(os.path.join(root, "_DONE")):
        _sh.rmtree(root, ignore_errors=True)
        os.makedirs(src_dir, exist_ok=True)
        # day 1: even doc_ids arrive; first invocation drains them
        stage(new.filter(F.col("doc_id") % 2 == 0), "000.parquet", 0)
        run_once()
        # day 2 lands; the SECOND invocation resumes the checkpoint
        stage(new.filter(F.col("doc_id") % 2 == 1), "001.parquet", 1)
        run_once()
        open(os.path.join(root, "_DONE"), "w").close()

    return spark.read.schema("doc_id bigint, reason string").parquet(out)


def embed_gate_resume_plan(
    spark: SparkSession, src, members, cl_ids, cmat, day: int
):
    """One restart's plan for the resumable embedding gate: quantize
    + nearest-FROZEN-centroid assignment as a single codegen
    expression (the centroid matrix rides the plan as a SQL-parsed
    literal — q_stream_embed_gate's rule), stream-static equi-join on
    cell against the index members AS OF this restart, exact Arrow-
    dot cosine ≥ SEM_TAU, tagged with this restart's ingest_day.
    Factored out so the registry op and the RocksDB restart pytest
    drive the identical plan against their own checkpoints."""
    from data_wrangler_spark.functions.vectors import (
        make_dot_udf,
        norm,
        round6,
        to_double_array,
    )
    from data_wrangler_spark.operators.dedup import SEM_TAU
    from data_wrangler_spark.operators.embeddings_ext import (
        assign_cell_expr,
        quantize_expr,
    )

    # MAX_CELL: split arity from this restart's index membership —
    # identical to the batch two-day probe's per-day subs
    from data_wrangler_spark.operators.dedup import _cell_subs, _with_sub

    subs = _cell_subs(members)
    a = _with_sub(
        src.select(
            F.col("vec_id").alias("vec_new"),
            to_double_array("embedding").alias("ea"),
            quantize_expr(F.col("embedding")).alias("xs"),
        )
        .withColumn("cell", assign_cell_expr(cl_ids, cmat).cast("int"))
        .withColumn("na", norm(F.col("ea")))
        .drop("xs"),
        subs,
        "ea",
    )
    b = _with_sub(members, subs, "e").select(
        F.col("vec_id").alias("vec_old"),
        "cell",
        "sub",
        F.col("e").alias("eb"),
        norm(F.col("e")).alias("nb"),
    )
    dot_udf = make_dot_udf()
    return (
        a.join(b, ["cell", "sub"])
        .withColumn(
            "cos_sim",
            round6(
                dot_udf(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ),
        )
        .filter(F.col("cos_sim") >= SEM_TAU)
        .select(
            F.lit(day).alias("ingest_day"),
            "vec_new",
            "vec_old",
            "cell",
            "cos_sim",
        )
        .dropDuplicates(["vec_new", "vec_old"])
    )


def _stream_embed_resume_oracle() -> str:
    # the two-day batch oracle: restart boundaries must be invisible
    # in the emitted data, so the accumulated sink ≡ the single
    # batch replay of both ingest days
    from data_wrangler_spark.operators.dedup import _embed_2day_oracle

    return _embed_2day_oracle()


@register(
    "q_stream_embed_resume",
    oracle=_stream_embed_resume_oracle(),
    tags=("stream", "llm", "dedup", "embedding"),
)
def q_stream_embed_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding gate delivered across a RESTART composed with the
    index APPEND — the vector index's daily production shape,
    driver-checked (VERDICT r12 #2: q_stream_quarantine_resume proved
    restart/resume for the text gates; this is the same proof for the
    vector side, composed with q_dedup_embed_2day's append):

    - run 1: day-1's vector file streams against a DURABLE checkpoint
      + exactly-once parquet sink, probing the history-only index
      (day0) — emissions tagged ingest_day=1;
    - between runs, the INDEX GROWS: day-1's vectors are appended as
      the day1/ cell-partitioned sibling root (the
      _ensure_embed_2day_built append), and day-2's file lands;
    - run 2 RESUMES the same checkpoint: the source log skips day-1's
      already-committed file, dropDuplicates state is restored, and
      day-2 streams against the GROWN index (day0 ∪ day1) — a day-2
      vector near-duplicating a day-1 vector is caught through
      members that entered the index between the two runs.

    The returned rows are the sink's accumulated contents and the
    oracle is the batch q_dedup_embed_2day replay (history-only fit,
    both assignments, both probes from raw embeddings) — the checked
    claim is exactly-once ACROSS the restart-plus-append: the
    two-invocation union must be bit-identical to the single batch
    derivation. (The same property is pinned procedurally under
    RocksDB with per-run input-row counts by tests/test_streaming.py.)

    Scale: each restart pays only its new files (source-log resume)
    and its batch's same-cell members (the static side prunes to the
    batch's cells when the members live cell-partitioned, which the
    day0/day1 roots are); state is one key per emitted pair. The
    restart re-resolves the static side, which is precisely how a
    long-lived ingest picks up index appends without rebuilding —
    checkpointed stream progress + append-only index = the daily loop."""
    from data_wrangler_spark.catalog import scratch_tag
    from data_wrangler_spark.operators.dedup import (
        INC2_DAY1,
        INC2_DAY2,
        _ensure_embed_2day_built,
        _read_embed_centroids,
    )

    base = _ensure_embed_2day_built(spark, sf_dir)
    cl_ids, cmat = _read_embed_centroids(spark, f"{base}/centroids")
    mem_schema = "vec_id bigint, e array<double>, cell int"
    day0 = spark.read.schema(mem_schema).parquet(f"{base}/day0")
    day1 = spark.read.schema(mem_schema).parquet(f"{base}/day1")

    e_all = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    m10 = F.col("vec_id") % 10

    # the scratch key folds in EVERY constant that governs the emitted
    # rows (quantizer shape + pairing threshold, not just the day
    # split) — same rule as dedup.py's index tag: a tuned constant
    # must invalidate the _DONE-guarded scratch, or replay serves
    # stale rows against the refreshed oracle (ADVICE r13)
    from data_wrangler_spark.operators.dedup import MAX_CELL, SEM_TAU
    from data_wrangler_spark.operators.embeddings_ext import (
        KM_ITER,
        KM_K,
        KM_Q,
    )

    root = os.path.join(
        SCRATCH,
        "embed_resume",
        scratch_tag(
            sf_dir,
            "embeddings",
            f"d1={INC2_DAY1},d2={INC2_DAY2},k={KM_K},q={KM_Q},"
            f"it={KM_ITER},tau={SEM_TAU},cap={MAX_CELL},v1",
        ),
    )
    src_dir = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")

    def stage(df, name: str, bump: int) -> None:
        tmp = os.path.join(root, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src_dir, name)
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        ts = time.time() + bump
        os.utime(dst, (ts, ts))

    def run_once(members, day: int) -> None:
        src = (
            spark.readStream.schema(e_all.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        _run_stream_to_dir(
            embed_gate_resume_plan(spark, src, members, cl_ids, cmat, day),
            out,
            ckpt,
        )

    if not os.path.exists(os.path.join(root, "_DONE")):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(src_dir, exist_ok=True)
        # day 1 arrives; run 1 probes the history-only index
        stage(e_all.filter(m10 == INC2_DAY1), "000.parquet", 0)
        run_once(day0, 1)
        # the index appends day-1, day-2's file lands; run 2 resumes
        stage(e_all.filter(m10 == INC2_DAY2), "001.parquet", 1)
        run_once(day0.unionByName(day1), 2)
        open(os.path.join(root, "_DONE"), "w").close()

    return spark.read.schema(
        "ingest_day int, vec_new bigint, vec_old bigint, "
        "cell int, cos_sim double"
    ).parquet(out)


def _stream_pii_oracle() -> str:
    from data_wrangler_spark.operators.text_analysis import (
        pii_stream_oracle,
    )

    return pii_stream_oracle()


@register(
    "q_stream_pii_scrub",
    oracle=_stream_pii_oracle(),
    tags=("stream", "llm", "text", "pii"),
)
def q_stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII gate delivered AS a stream — q_pii_scrub's per-doc
    detection/redaction applied to arriving documents, completing
    the streaming-delivery matrix for the newest gate family the
    way the LSH, gram, and embedding gates already stream. Two
    micro-batches (doc_id parity split); each arriving doc is
    counted per class and redacted by the IDENTICAL Column
    expressions as the batch op (pii_perdoc — factored, so the two
    deliveries cannot drift), and docs with any hit are emitted as
    (doc_id, n_email, n_phone, n_ip, n_pan, n_pii, redacted). The
    oracle is the batch per-doc replay (the shared CTE chain minus
    the audit row), so the streamed emission is value-hash checked
    end to end.

    Scale: the ideal streaming stage — STATELESS and row-local
    (pure codegen string expressions, no join, no aggregation, no
    dedup state; the corpus-level audit is the batch op's job, not
    the stream's), so throughput is scan-bound and a restart needs
    only the source log. Every arriving document is scrubbed
    exactly once by the file source's own commit semantics."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = _stage_parts(
        f"pii_{os.path.basename(sf_dir.rstrip('/'))}",
        [
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ],
    )
    from data_wrangler_spark.operators.text_analysis import pii_perdoc

    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    return _run_stream(
        pii_perdoc(src).filter(F.col("n_pii") > 0), "q_stream_pii_scrub"
    )
