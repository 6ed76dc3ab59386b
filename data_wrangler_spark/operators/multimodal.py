"""Multimodal-column operators (north star).

Image/audio/video content at 100 TB lives as opaque `binary` columns
plus typed metadata structs; the decode step runs in Arrow-batched
Python (`mapInPandas`) so each worker processes partition-sized
batches. The actual codec libraries aren't in this container, so the
decode body is a deterministic fake behind `_decode_stub` — the
Spark-side plumbing (schemas, batching, partitioning) is real and
oracle-checked where the fake is SQL-expressible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_wrangler_spark.catalog import load_table
from data_wrangler_spark.functions.vectors import micro_csv, sql_micro_csv
from data_wrangler_spark.registry import register


@register(
    "q_multimodal_cols",
    oracle="""
    SELECT d.doc_id, d.text, d.lang,
           CAST(len(e.embedding) AS INT) AS dim,
           e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: join text + embedding modalities,
    pack into a typed struct (the storage/transport shape), then
    project fields back out (what the harness can value-compare).
    The struct round-trip is the point: schema evolution and columnar
    pruning both operate on the struct fields at scale."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    rec = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            F.struct(
                F.col("doc_id"),
                F.col("text"),
                F.col("lang"),
                F.col("embedding"),
                F.col("label"),
            ).alias("record")
        )
    )
    return rec.select(
        F.col("record.doc_id").alias("doc_id"),
        F.col("record.text").alias("text"),
        F.col("record.lang").alias("lang"),
        F.size("record.embedding").alias("dim"),
        F.col("record.label").alias("label"),
    )


@register(
    "q_mm_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) % 10 AS INT) AS n_frames,
             octet_length(encode(text)) AS blen
      FROM documents),
    frames AS (
      SELECT doc_id, n_frames, CAST(f AS INT) AS frame_idx, blen
      FROM meta, LATERAL unnest(range(0, n_frames)) AS t(f)
      WHERE f % 2 = 0)
    SELECT doc_id, n_frames, frame_idx,
           CAST(blen // greatest(n_frames, 1) AS INT) AS frame_bytes
    FROM frames
    """,
    tags=("llm", "multimodal"),
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: per payload,
    the (stubbed) container metadata yields n_frames; every 2nd frame
    index is emitted as its own row with its byte span — the
    one-payload→many-samples expansion that feeds a training
    pipeline. The expansion itself is JVM-side (sequence+explode on
    the Python-extracted metadata); only metadata extraction runs in
    Arrow batches. A real deployment swaps the stub for ffmpeg
    keyframe indices; the plan shape is unchanged."""
    feats = q_mm_decode(spark, sf_dir).select("doc_id", "n_frames", "byte_len")
    frames = feats.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.when(F.col("n_frames") > 0,
                   F.sequence(F.lit(0), F.col("n_frames") - 1))
            .otherwise(F.array().cast("array<int>"))
        ).alias("frame_idx"),
        "byte_len",
    ).filter(F.col("frame_idx") % 2 == 0)
    return frames.select(
        "doc_id",
        "n_frames",
        "frame_idx",
        (F.col("byte_len") / F.greatest(F.col("n_frames"), F.lit(1)))
        .cast("int")
        .alias("frame_bytes"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. A real deployment swaps this body
    for PIL/librosa/ffmpeg frame sampling; the signature — bytes in,
    typed features out — and the surrounding Arrow batching are what
    the engine guarantees. Raising NotImplementedError here would
    also be legitimate; a deterministic fake keeps the plumbing
    testable end-to-end."""
    return {
        "byte_len": len(payload),
        "content_sha": hashlib.sha256(payload).hexdigest(),
        "n_frames": len(payload) % 10,  # fake "frame count"
    }


@register(
    "q_mm_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           sha256(text)                            AS content_sha,
           CAST(octet_length(encode(text)) % 10 AS INT) AS n_frames,
           lang
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode / feature-extract plumbing: text → binary column
    (standing in for image/audio payloads), then mapInPandas batches
    run the (stubbed) decoder per payload. Arrow moves binary columns
    zero-copy; partition count — not row count — bounds Python
    invocations. The oracle reproduces the fake decoder in SQL, so
    the full Python path is value-checked."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"), "lang"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": feats.map(lambda f: f["byte_len"]),
                    "content_sha": feats.map(lambda f: f["content_sha"]),
                    "n_frames": feats.map(lambda f: f["n_frames"]),
                    "lang": pdf["lang"],
                }
            )

    return d.mapInPandas(
        decode_batches,
        "doc_id bigint, byte_len int, content_sha string, n_frames int, lang string",
    )


# SQL mirror of one sha256-hex byte → [0,1] feature: value of hex
# digit pair (2j+1, 2j+2) divided by 255.
def _sql_hash_feature(j: int) -> str:
    hi = f"(strpos('0123456789abcdef', substring(sha256(text), {2 * j + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substring(sha256(text), {2 * j + 2}, 1)) - 1)"
    return f"CAST({hi} * 16 + {lo} AS DOUBLE) / 255.0"


MM_EMBED_DIM = 8


@register(
    "q_mm_embed",
    oracle=f"""
    SELECT doc_id, lang,
           {sql_micro_csv('[' + ', '.join(_sql_hash_feature(j) for j in range(MM_EMBED_DIM)) + ']')}
             AS features
    FROM documents
    """,
    tags=("llm", "multimodal", "embedding"),
)
def q_mm_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → fixed-dim feature vector, the
    feature-extraction leg of a multimodal pipeline (image/audio
    embedding models slot in here). The Python side runs REAL
    mapInPandas plumbing — Arrow-batched binary in, fixed-width
    array<double> out — with a deterministic stand-in extractor
    (first 8 sha256 digest bytes scaled to [0,1]), so the oracle can
    restate it in SQL and value-check the whole Python path, batch
    boundaries included. Swap `_embed_stub` for a model call and
    the schema, batching, and partition behavior are unchanged; at
    scale tune batch size via spark.sql.execution.arrow
    .maxRecordsPerBatch to amortize model invocation."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"), "lang"
    )

    def _embed_stub(payload: bytes) -> list[float]:
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[:MM_EMBED_DIM]]

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "features": pdf["payload"].map(_embed_stub),
                }
            )

    out = d.mapInPandas(
        embed_batches, "doc_id bigint, lang string, features array<double>"
    )
    # The Python leg emits the real array<double>; the registered
    # result serializes it to fixed-point CSV because the driver
    # harness hashes cells and can't canonicalize list values.
    return out.select("doc_id", "lang", micro_csv("features").alias("features"))


RESIZE_FACTOR = 4  # fake "downsample by 4" — stands in for a real scaler


@register(
    "q_mm_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS in_bytes,
           CAST(octet_length(encode(text)) // {RESIZE_FACTOR} AS INT) AS out_bytes,
           CAST(octet_length(encode(text)) % 100 AS INT) AS in_width,
           CAST(octet_length(encode(text)) % 100 // {RESIZE_FACTOR} AS INT) AS out_width,
           sha256(substring(text, 1, CAST(octet_length(encode(text)) // {RESIZE_FACTOR} AS INT))) AS out_sha
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/transcode plumbing: binary payload in, smaller binary
    payload + updated dimension metadata out, through mapInPandas.
    The stand-in 'scaler' truncates the payload to 1/4 and scales the
    fake width metadata; a real deployment swaps the body for
    PIL/ffmpeg. The output payload itself is value-checked through
    its sha256 (the harness compares the digest, proving the Python
    path produced exactly the bytes the SQL restatement predicts).
    Payloads never shuffle — the op is scan → mapInPandas → project,
    and metadata-only consumers downstream prune the binary column
    out of the scan entirely."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            out = pdf["payload"].map(lambda p: p[: len(p) // RESIZE_FACTOR])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_bytes": n,
                    "out_bytes": out.map(len),
                    "in_width": n % 100,
                    "out_width": (n % 100) // RESIZE_FACTOR,
                    "out_sha": out.map(lambda p: hashlib.sha256(p).hexdigest()),
                }
            )

    return d.mapInPandas(
        resize_batches,
        "doc_id bigint, in_bytes int, out_bytes int, in_width int, out_width int, out_sha string",
    )


AUDIO_WIN = 400   # fake samples (=bytes) per chunk
AUDIO_HOP = 200   # hop: 50% overlap, the standard ASR framing


@register(
    "q_mm_audio_chunk",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len
      FROM documents),
    chunks AS (
      SELECT doc_id, byte_len, CAST(s AS INT) AS start_byte
      FROM meta, LATERAL unnest(range(0, byte_len, {AUDIO_HOP})) AS t(s))
    SELECT doc_id,
           CAST(start_byte // {AUDIO_HOP} AS INT)                  AS chunk_idx,
           start_byte,
           CAST(least({AUDIO_WIN}, byte_len - start_byte) AS INT)  AS chunk_bytes,
           least({AUDIO_WIN}, byte_len - start_byte) < {AUDIO_WIN} AS is_tail
    FROM chunks
    """,
    tags=("llm", "multimodal"),
)
def q_mm_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plumbing: waveform-like payloads segmented into
    overlapping windows (400-sample window, 200-sample hop — each
    sample covered by ≤2 chunks), the framing an ASR/embedding
    pipeline feeds its model. Byte length comes off the real Arrow
    decode path (q_mm_decode's mapInPandas); the chunk expansion is
    JVM-side sequence+explode, so the one-payload→many-chunks fan-out
    costs no Python. A real deployment swaps the length arithmetic
    for codec frame offsets; schema and plan shape are unchanged.

    Scale: explode multiplies rows ~len/hop ×; the expansion is
    stateless and partition-local (no shuffle), so output partition
    sizing is governed by input split size — halve
    files.maxPartitionBytes to hold post-explode partitions constant."""
    feats = q_mm_decode(spark, sf_dir).select("doc_id", "byte_len")
    return (
        feats.select(
            "doc_id",
            "byte_len",
            F.explode(
                F.sequence(F.lit(0), F.col("byte_len") - 1, F.lit(AUDIO_HOP))
            ).alias("start_byte"),
        )
        .select(
            "doc_id",
            (F.col("start_byte") / AUDIO_HOP).cast("int").alias("chunk_idx"),
            "start_byte",
            F.least(F.lit(AUDIO_WIN), F.col("byte_len") - F.col("start_byte"))
            .cast("int")
            .alias("chunk_bytes"),
            (
                F.least(F.lit(AUDIO_WIN), F.col("byte_len") - F.col("start_byte"))
                < AUDIO_WIN
            ).alias("is_tail"),
        )
    )
