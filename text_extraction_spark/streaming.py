"""Structured Streaming plane — SURVEY.md §2-B Q28–Q32 streaming twins.

Batch-mode window aggregations (tumbling/sliding/session) live in
relational.py with DuckDB oracles; this module provides the genuinely
streaming pieces: a deterministic file-source replay of the `events`
table, watermarked windowed aggregation under Trigger.AvailableNow, and
streaming dedup — with late-data semantics asserted in
tests/test_streaming.py (FIXTURES.md §4).
"""

from __future__ import annotations

import os
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_replay_dir(
    sf_dir: str, out_dir: str, n_chunks: int = 10, late_chunk: bool = False
) -> str:
    """Split events.parquet into n chronological chunks (chunk-00..NN) —
    a deterministic stand-in for a stream arriving in event-time order.

    late_chunk=True: hold back a slice of the OLDEST events and append it
    as the final chunk — rows that arrive after the watermark has passed
    their window, to exercise late-data dropping.
    """
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    order = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    import pyarrow.compute as pc

    idx = pc.sort_indices(order.column("ts"))
    tbl = tbl.take(idx)
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    if late_chunk:
        # oldest 5% arrives LAST
        held = tbl.slice(0, max(1, n // 20))
        rest = tbl.slice(max(1, n // 20))
        step = max(1, rest.num_rows // n_chunks)
        chunks = [rest.slice(i * step, step) for i in range(n_chunks - 1)]
        tail = rest.slice((n_chunks - 1) * step)
        if tail.num_rows:
            chunks.append(tail)
        chunks.append(held)
    else:
        step = max(1, n // n_chunks)
        chunks = [tbl.slice(i * step, step) for i in range(n_chunks - 1)]
        chunks.append(tbl.slice((n_chunks - 1) * step))
    import time as _time

    base_mtime = _time.time()
    for i, c in enumerate(c for c in chunks if c.num_rows):
        p = os.path.join(out_dir, f"chunk-{i:03d}.parquet")
        pq.write_table(c, p)
        # FileStreamSource orders new files by MODIFICATION TIME; chunks
        # written within the same clock tick tie and can be picked up out
        # of order (observed: the held-back late chunk processed early →
        # watermark never ahead of it → flaky drop counts). Strictly
        # increasing mtimes make replay order = chunk order, always.
        os.utime(p, (base_mtime + i, base_mtime + i))
    return out_dir


def stream_source(
    spark: SparkSession,
    fmt: str = "file-replay",
    path: str | None = None,
    **options: str,
) -> DataFrame:
    """Streaming-source seam (round 3; mirrors catalog.py's Iceberg
    seam): the single place a source format binds, so a production
    source swaps in with one argument and nothing else changes.

    * 'file-replay' — this sandbox's live source: ordered parquet chunk
      replay with maxFilesPerTrigger=1 (read_events_stream).
    * 'rate' — Spark's built-in synthetic source (smoke-tested).
    * 'kafka' — the production line; raises at load() in this env
      because no kafka connector jar / broker exists (options pass
      through: kafka.bootstrap.servers, subscribe, ...).
    """
    if fmt == "file-replay":
        if path is None:
            raise ValueError("file-replay requires path=<replay_dir>")
        return read_events_stream(spark, path)
    if fmt in ("rate", "kafka"):
        reader = spark.readStream.format(fmt)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unknown stream source format: {fmt!r}")


def read_events_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    schema = spark.read.parquet(replay_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
        # parquet µs timestamps surface as TIMESTAMP_NTZ in Spark 4, but
        # watermarks require TIMESTAMP; session tz is UTC so values are
        # unchanged by the cast.
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def run_available_now(
    stream_df: DataFrame,
    spark: SparkSession,
    with_stats: bool = False,
    output_mode: str = "append",
):
    """Run a streaming aggregation to completion with Trigger.AvailableNow
    into a memory sink; return the materialized result (and, with
    with_stats=True, per-run totals incl. rows dropped by watermark)."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table(name)
    if not with_stats:
        return result
    dropped = 0
    batches = 0
    for p in q.recentProgress:
        batches += 1
        for so in p["stateOperators"]:
            dropped += so.get("numRowsDroppedByWatermark", 0) or 0
    return result, {"batches": batches, "rows_dropped_by_watermark": dropped}


def windowed_counts(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts (Q31). In append mode a window
    is emitted only once the watermark passes its end — late rows older
    than the watermark are dropped from state."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("ws"), "cnt", "total")
    )


def streaming_dedup(stream: DataFrame, watermark: str = "60 minutes") -> DataFrame:
    """Q32 streaming twin: exactly-once event_id dedup bounded by a
    watermark (state is purged past it)."""
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id")
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (SURVEY §2-C):
    per-user running event count + value total maintained across
    micro-batches in explicit GroupState — the pattern for stateful
    logic that windows/dedup can't express. Update output mode: each
    batch emits the refreshed running totals for the users it touched."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, v double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_counts_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31 entry: replay events as a file stream, watermarked windowed
    counts, AvailableNow to completion (rows-only driver check)."""
    import tempfile

    replay = make_replay_dir(sf_dir, tempfile.mkdtemp(prefix="events_replay_"))
    return run_available_now(windowed_counts(read_events_stream(spark, replay)), spark)


def extract_corpus_streaming(
    spark: SparkSession,
    docs_stream_dir: str,
    corpus_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 2,
) -> dict:
    """Incremental extraction: documents arriving as a file stream are
    run through the SAME extraction pipeline (extract_spans + reassemble)
    per micro-batch via foreachBatch, Trigger.AvailableNow.

    Semantics: the checkpoint gives at-least-once batch replay; per-batch
    output lands in extracted_stream/batch_id=N so a replayed batch
    OVERWRITES its own directory (idempotent), mirroring the A18 bucket
    protocol. The media store is static (the common shape: media blobs
    land first, document records reference them)."""
    import os

    from .pipeline import extract_spans, load_media, reassemble

    media = load_media(spark, corpus_dir)
    schema = spark.read.parquet(docs_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_stream_dir)
    )
    out_table = os.path.join(out_dir, "extracted_stream")
    n_batches = {"n": 0}

    def process(batch_df, batch_id: int) -> None:
        result = reassemble(extract_spans(batch_df, media), batch_df)
        result.write.mode("overwrite").parquet(
            os.path.join(out_table, f"batch_id={batch_id}")
        )
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"batches": n_batches["n"], "out_table": out_table}


def stream_stream_join(spark: SparkSession, replay_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarked state: purchases joined
    to the same user's signups within 1 hour before the purchase. Both
    sides are streaming; watermarks bound the join state retention."""
    purchases = (
        read_events_stream(spark, replay_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    signups = (
        read_events_stream(spark, replay_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "30 minutes")
    )
    return purchases.join(
        signups,
        F.expr(
            "p_user = s_user AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR"
        ),
    ).select("purchase_id", "signup_id", "p_ts", "s_ts")


def make_docs_replay_dir(sf_dir: str, out_dir: str, n_chunks: int = 8) -> str:
    """Split documents.parquet into n doc_id-ordered chunks with strictly
    increasing mtimes — the deterministic ingest-stream stand-in for a
    crawl feed (same mtime discipline as make_replay_dir: the file
    source orders new files by modification time)."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    import pyarrow.compute as pc

    tbl = tbl.take(pc.sort_indices(tbl.column("doc_id")))
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    step = max(1, n // n_chunks)
    chunks = [tbl.slice(i * step, step) for i in range(n_chunks - 1)]
    chunks.append(tbl.slice((n_chunks - 1) * step))
    import time as _time

    base = _time.time()
    for i, c in enumerate(c for c in chunks if c.num_rows):
        p = os.path.join(out_dir, f"chunk-{i:03d}.parquet")
        pq.write_table(c, p)
        os.utime(p, (base + i, base + i))
    return out_dir


def read_docs_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    schema = spark.read.parquet(replay_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
    )


def streaming_ingest_dedup(stream: DataFrame) -> DataFrame:
    """Streaming exact ingest-dedup: the d54 incremental shape as a
    continuous query — each micro-batch's documents dedup against ALL
    previously-seen content hashes via dropDuplicates state. The state
    store holds one 128-bit hash per distinct document (at production
    scale, bounded with dropDuplicatesWithinWatermark over an ingest-time
    watermark; this corpus feed has no event time, so state is the full
    hash set — the same memory the batch index join would broadcast)."""
    return stream.select(F.md5("text").alias("text_hash")).dropDuplicates(
        ["text_hash"]
    )
