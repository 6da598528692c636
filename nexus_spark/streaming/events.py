"""Structured Streaming over the events table.

The reference has no streaming query surface (its ingest is a message
pipeline, SURVEY §2.7); this module adds the Spark-native equivalent:
watermarked window aggregates over an event stream, with the same
aggregation semantics as the batch S1 family so streaming results converge
to the batch answers.

The events parquet doubles as a replayable stream source
(``spark.readStream.schema(...).parquet`` over a directory, or
rate-limited via maxFilesPerTrigger). Tests run foreachBatch into memory
sinks and compare against the batch equivalent — the canonical
kappa-architecture check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_spark.streaming import ensure_event_time


def read_events_stream(spark: SparkSession, path_dir: str,
                       schema=None) -> DataFrame:
    """Replay the events parquet directory as a stream (one file per
    micro-batch)."""
    if schema is None:
        static = spark.read.parquet(path_dir)
        schema = static.schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_dir)
    )


def _normalize_ts(events: DataFrame) -> DataFrame:
    from pyspark.sql.types import LongType

    for f in events.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, LongType):
            return events.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return events


def windowed_stats(events: DataFrame, window: str = "1 hour",
                   slide: str | None = None,
                   watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling (or sliding) window stats per event_type:
    count, avg, min, max — late rows beyond the watermark are dropped, the
    state store stays bounded. Works on both a stream and a static frame
    (same code path — the batch run is the correctness oracle)."""
    ev = _normalize_ts(events)
    if ev.isStreaming:
        ev = ensure_event_time(ev, "ts").withWatermark("ts", watermark)
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("ev_cnt"),
             F.avg("value").alias("ev_avg"),
             F.min("value").alias("ev_min"),
             F.max("value").alias("ev_max"))
        .select(F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"),
                "event_type", "ev_cnt", "ev_avg", "ev_min", "ev_max")
    )


def session_stats(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    """Per-user session-window aggregation (Structured Streaming
    ``session_window``): a session extends while consecutive events are
    at most `gap` apart; its window is [first_event, last_event + gap].
    Per-event windows MERGE when they touch, so an event at exactly
    last + gap still EXTENDS the session — the batch break condition is
    delta > gap (verified empirically in test_streaming).

    On a stream, watermarked append mode emits a session only once the
    watermark passes its end (end already includes the gap, so no future
    event can extend it) — with an availableNow drain the emitted set is
    exactly the sessions whose end <= max(ts) − watermark delay, which is
    the relational condition the batch oracle recomputes. On a static
    frame the same code path yields ALL sessions (the full batch
    equivalent). State per key is one open session row, bounded by the
    watermark — the kappa-correct design for clickstream sessionization
    at any scale (vs the batch gaps-and-islands double window,
    sql_surface.sessionize).

    Output: user_id, session_start, session_end, n_events, session_value.
    """
    ev = _normalize_ts(events)
    if ev.isStreaming:
        ev = ensure_event_time(ev, "ts").withWatermark("ts", watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"),
                   F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("session_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "session_value")
    )


def run_stream_to_memory(spark: SparkSession, stream_df: DataFrame,
                         name: str = "stream_out",
                         timeout_s: int = 120,
                         mode: str = "complete") -> DataFrame:
    """Execute a streaming query into an in-memory sink until the source is
    exhausted; returns the result as a static DataFrame. mode="complete"
    for aggregations, "append" for stateless projections."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return spark.table(name)
