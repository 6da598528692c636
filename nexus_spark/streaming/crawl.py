"""Continuous web-crawl ingest: watch a directory for WARC archives,
extract documents, scrub and append to a document lake.

The crawl-side twin of streaming/ingest.py (granules): a `binaryFile`
file-source stream discovers new archives exactly-once via the checkpoint
log; each archive parses inside its own task with the from-scratch WARC
parser (sources/warc.py); extraction + PII scrubbing are the SAME
stateless JVM projections the batch pipeline uses, so streamed documents
are byte-identical to a batch run over the same archives.

Scale shape: one task per archive (WARC is not splittable mid-stream —
file granularity is the Common Crawl processing norm), no shuffle
anywhere before the lake append; throughput = archive-read parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from nexus_spark.sources.warc import WARC_SCHEMA, warc_to_documents


def stream_warc(spark: SparkSession, watch_dir: str,
                max_files_per_trigger: int | None = None,
                glob: str = "*.warc*") -> DataFrame:
    """Streaming frame of raw WARC records from archives appearing under
    `watch_dir` (WARC_SCHEMA rows)."""
    from nexus_spark.sources.warc import _make_warc_codec

    parse, _ = _make_warc_codec()  # nested fn -> pickled by value

    src = (spark.readStream.format("binaryFile")
           .schema("path string, modificationTime timestamp, "
                   "length long, content binary")
           .option("pathGlobFilter", glob))
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", str(max_files_per_trigger))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse(bytes(content)):
                    rows.append((path_,) + rec)
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WARC_SCHEMA.fields])

    return (src.load(watch_dir).select("path", "content")
            .mapInPandas(run, WARC_SCHEMA))


def stream_crawl_documents(spark: SparkSession, watch_dir: str,
                           scrub: bool = True,
                           max_files_per_trigger: int | None = None
                           ) -> DataFrame:
    """Streaming document frame: WARC responses -> (doc_id, url, text),
    optionally PII-redacted — all stateless projections, so the stream
    output equals the batch pipeline on the same archives exactly."""
    from nexus_spark.operators.scrub import redact_pii

    docs = warc_to_documents(stream_warc(
        spark, watch_dir, max_files_per_trigger=max_files_per_trigger))
    return redact_pii(docs) if scrub else docs


def crawl_to_lake(docs: DataFrame, lake_path: str, checkpoint: str,
                  available_now: bool = True) -> StreamingQuery:
    """Append streamed documents to a parquet document lake via
    foreachBatch; the checkpoint log makes each archive's contribution
    exactly-once across restarts."""
    def append_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("append").parquet(lake_path)

    writer = (docs.writeStream.foreachBatch(append_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
