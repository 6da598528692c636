"""Streaming deduplication — the continuous-ingest face of operators/dedup.

A training-data pipeline at scale ingests documents continuously; exact
dedup must then be a property of the STREAM, not a batch afterthought.
Two bounded-state strategies, both pure Structured Streaming:

1. `streaming_exact_dedup` — content-hash + dropDuplicatesWithinWatermark:
   built-in state store keyed by the hash, rows older than the event-time
   watermark are evicted, so state is bounded by (arrival rate x
   watermark) regardless of corpus size. The right default when duplicate
   copies arrive near each other in time (crawl re-fetches, retries).
2. `first_seen` — applyInPandasWithState with a processing-time TTL: an
   explicit seen-set that admits exactly the first copy of each hash and
   suppresses later ones for as long as the TTL keeps the key alive.
   Choose when duplicates spread wider than any event-time watermark you
   can afford, and the TTL is the state bound you are signing up for.

Batch parity: on a static frame both reduce to groupBy(content_hash) ->
first — i.e. operators/dedup.exact_duplicates' keep set, which is what the
tests compare against (the kappa-architecture check used throughout
streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.streaming import ensure_event_time
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

FIRST_SEEN_SCHEMA = StructType([
    StructField("content_hash", StringType()),
    StructField("keep_id", LongType()),
])

_SEEN_STATE = StructType([StructField("seen", LongType())])


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 content hash — same keying as operators/dedup.exact_duplicates
    so streaming and batch dedup agree on what "duplicate" means."""
    return docs.withColumn("content_hash", F.md5(F.col(text_col)))


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text",
                          time_col: str = "ts",
                          watermark: str = "1 hour") -> DataFrame:
    """First copy of each content hash within the watermark horizon;
    duplicates arriving inside the horizon are dropped, state for hashes
    older than the watermark is evicted. On a static frame this is plain
    dropDuplicates (the batch oracle)."""
    hashed = with_content_hash(docs, text_col)
    if not hashed.isStreaming:
        return hashed.dropDuplicates(["content_hash"])
    return (ensure_event_time(hashed, time_col)
            .withWatermark(time_col, watermark)
                  .dropDuplicatesWithinWatermark(["content_hash"]))


def first_seen(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               state_ttl_minutes: int = 24 * 60) -> DataFrame:
    """Explicit seen-set dedup: emits (content_hash, keep_id) exactly once
    per hash — the first copy to arrive — and suppresses every later copy
    while the key's TTL keeps it in the state store.

    State per key is one long; the TTL turns the seen-set into a sliding
    de-dup horizon so a 100 TB corpus never accumulates unbounded state.
    The closure is self-contained (no package imports) so workers unpickle
    it without a deployed package.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = int(state_ttl_minutes) * 60 * 1000

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"content_hash": [], "keep_id": []})
            return
        emitted = []
        if not state.exists:
            for pdf in pdfs:
                if len(pdf):
                    emitted.append(int(pdf["keep_id"].iloc[0]))
                    break
            state.update((1,))
        else:
            for _ in pdfs:  # drain the iterator; all copies are duplicates
                pass
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"content_hash": [key[0]] * len(emitted),
                            "keep_id": emitted})

    hashed = with_content_hash(docs, text_col).select(
        "content_hash", F.col(id_col).cast("long").alias("keep_id"))
    return hashed.groupBy("content_hash").applyInPandasWithState(
        update, outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_SEEN_STATE, outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
