"""Structured Streaming event-time pipeline.

The batch operators in operators/events.py are written against
event-time semantics precisely so these streaming forms are the *same
expressions* behind ``readStream`` — the Spark unification the
reference's hard two-phase barrier (/root/reference/mapreduce.cc:200)
has no analog for.

Design:
- sources: file-stream over a parquet directory (tests feed it by
  copying files in), schema from the catalog;
- watermarks bound state: late events beyond the watermark are dropped,
  which is what makes unbounded streams runnable in bounded memory at
  scale;
- tumbling/sliding = ``F.window`` groupBy aggregation (incremental,
  partial aggregation per micro-batch);
- sessions = ``F.session_window`` (state merges windows within gap);
- sinks: append/update to memory (tests) or any ``writeStream`` target.

The ``value`` sums here stay plain doubles: streaming state updates are
sequential per window, and the oracle story for streams is the batch
twin (tests assert stream result == batch result on the same data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import TABLE_SCHEMAS


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream with the catalog's events schema.

    NOTE: expects microsecond-timestamp parquet (the engine's internal
    event format); the driver's ns-timestamp testdata is converted by
    tests before feeding (Spark streams don't read TIMESTAMP(NANOS)).
    """
    return (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_tumbling_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """1-hour tumbling count+sum per event_type with watermarked state —
    the streaming twin of operators.events.q_event_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows with state — streaming twin of
    operators.events.q_event_session_native."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def run_stream_foreach_batch(
    stream_df: DataFrame, batch_fn, checkpoint_dir: str | None = None
) -> "object":
    """Drive a streaming DataFrame through a ``foreachBatch`` sink until
    all available input is processed.

    ``foreachBatch`` is the escape hatch for sinks Structured Streaming
    lacks natively (JDBC upserts, multi-table fan-out, MERGE INTO):
    ``batch_fn(batch_df, batch_id)`` receives each micro-batch as a
    BATCH DataFrame, so every batch writer in sources/sinks.py works
    unchanged inside it. Exactly-once comes from the (batch_id,
    checkpoint) pair: a restarted query re-offers the same batch_id, so
    idempotent writers (overwrite-by-batch-partition, MERGE on key)
    upgrade at-least-once delivery to effectively-once."""
    writer = stream_df.writeStream.foreachBatch(batch_fn).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return q


def run_stream_to_memory(
    stream_df: DataFrame, table_name: str, mode: str = "append"
) -> "object":
    """Drive a streaming DataFrame into an in-memory sink until all
    available input is processed (test/demo harness). Returns the
    stopped query; read results from ``spark.table(table_name)``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
