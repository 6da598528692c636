"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, partition-friendly batch shapes,
Arrow-batched mapInPandas UDF signatures — is real and tested; the actual
media decode is STUBBED (codec libraries are not available in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic content-hash-seeded fake
decode produces stable pseudo-features so the full pipeline is exercisable
end-to-end.

At 100 TB: binary payloads ride in parquet alongside metadata; decode/
feature-extract is a mapInPandas pass (Arrow batches, no JVM<->Python
per-row cost); frame sampling happens before feature extraction to bound
memory per batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), True),       # opaque encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("payload_len", LongType(), True),
    StructField("feat_mean", DoubleType(), True),
    StructField("feat_std", DoubleType(), True),
    StructField("feat_dim", IntegerType(), True),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (text bytes stand in
    for an encoded payload) — gives the binary-column plumbing a real
    DataFrame to run against."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> list[float]:
    """Decode an encoded image payload to a flat float feature vector.

    STUB: real decode requires an image codec (PIL/opencv — not in this
    container). With fake=True, a deterministic md5-seeded pseudo-decode
    returns a stable 16-dim vector, keeping the distributed plumbing
    testable.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic test decode")
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest]


def extract_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    mapInPandas: each Arrow batch is decoded vectorized in Python; output
    is a narrow typed frame. The decode itself is the stub above.
    """
    # The closure must be fully self-contained: Python workers unpickle it
    # without this package on their sys.path, so no module-level references.
    fake = fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as np

        def _decode(payload):
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; pass "
                    "fake_decode=True for the deterministic test decode")
            digest = _hashlib.md5(payload or b"").digest()
            return [b / 255.0 for b in digest]

        for pdf in batches:
            feats = [_decode(p) for p in pdf["payload"]]
            arr = np.asarray(feats, dtype=float)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "payload_len": pdf["payload"].map(
                    lambda b: len(b) if b is not None else None),
                "feat_mean": arr.mean(axis=1),
                "feat_std": arr.std(axis=1),
                "feat_dim": [arr.shape[1]] * len(pdf),
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (the decode of the actual frame is the stub). Pure relational
    explode — the frame-offset fan-out happens in the engine, so a video's
    frames parallelize across tasks."""
    with_duration = media.withColumn(
        "dur", F.coalesce(F.col("duration_ms"),
                          F.length("payload").cast("long")))
    return (
        with_duration
        .withColumn("frame_ms", F.explode(
            F.sequence(F.lit(0), F.col("dur") - 1, F.lit(every_ms))))
        .select("media_id", "media_type", "frame_ms")
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection incl. content digest — pure JVM columns
    (sha2 over binary), no decode needed. Oracle-able."""
    return media.select(
        "media_id", "media_type",
        F.length("payload").cast("long").alias("payload_len"),
        F.sha2(F.col("payload"), 256).alias("digest"),
        (F.ceil(F.length("payload") / F.lit(256.0))).cast("long").alias("n_chunks"),
    )
