"""Structured Streaming surface (events fixture)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def ensure_event_time(df: DataFrame, col: str) -> DataFrame:
    """Watermarks require a zone-aware TIMESTAMP event-time column;
    parquet sources may surface TIMESTAMP_NTZ (the driver fixtures do).
    Cast NTZ → timestamp (session tz is pinned to UTC, so the instant is
    unambiguous); leave anything else untouched."""
    field = df.schema[col]
    if isinstance(field.dataType, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
