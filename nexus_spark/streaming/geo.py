"""Streaming geo analytics: S1 time-series semantics on an observation
stream (SURVEY §7 phase 10).

The same cos-lat-weighted aggregation as operators.timeseries.time_series,
expressed over a watermarked daily tumbling window — a streaming query's
results converge to the batch answer once the watermark passes (verified in
tests). At scale this is the continuous-ingest view of the engine: late
tiles within the watermark still update their day; older ones are dropped
with bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.streaming import ensure_event_time

from nexus_spark.functions.geo import cos_lat_weight


def streaming_time_series(obs: DataFrame, watermark: str = "3 days") -> DataFrame:
    """Per-(dataset, day) area statistics over a (possibly streaming)
    observations frame: min, max, cos-lat weighted mean, count.

    (stddev is omitted on the stream: Spark disallows multiple distinct
    aggregate buffer shapes in some streaming output modes; the batch
    operator remains the full-stat surface.)
    """
    # Parquet round-trips can surface TIMESTAMP_NTZ, which watermarks
    # reject — normalize the event-time column first.
    df = obs.withColumn("time", F.col("time").cast("timestamp"))
    if df.isStreaming:
        df = ensure_event_time(df, "time").withWatermark("time", watermark)
    w = F.when(F.col("value").isNotNull(), cos_lat_weight("lat"))
    return (
        df.groupBy(F.window("time", "1 day").alias("w"), F.col("dataset"))
        .agg(F.min("value").alias("ts_min"),
             F.max("value").alias("ts_max"),
             (F.sum(F.col("value") * cos_lat_weight("lat")) / F.sum(w))
             .alias("ts_mean"),
             F.count("value").alias("ts_cnt"))
        .select(F.to_date(F.col("w.start")).alias("ts_date"), "dataset",
                "ts_min", "ts_max", "ts_mean", "ts_cnt")
    )
