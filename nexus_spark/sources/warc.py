"""WARC (Web ARChive, ISO 28500) source — the standard container for
web-crawl corpora (Common Crawl et al.), the raw input of most LLM
training-data pipelines.

From-scratch parser over the PUBLIC format spec (header block of CRLF
`Name: value` lines introduced by `WARC/1.x`, a blank line, then exactly
`Content-Length` payload bytes, then CRLF CRLF). Supports plain `.warc`
and gzipped input — both whole-file gzip and the per-record-member gzip
that crawlers emit (a multi-member stream: Python's gzip module stops at
the first member boundary, so members are walked manually).

Scale design: WARC files are the unit of parallelism (the format is not
splittable mid-stream without an index — the same file-granularity
Common Crawl processing uses everywhere): `binaryFile` yields one row
per file, and a mapInPandas pass parses each file's records inside its
task. A 1000-executor cluster processes 1000 archives concurrently; no
driver-side I/O at all. The parse closure is self-contained (pickled by
value) so executors need no package deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

WARC_SCHEMA = StructType([
    StructField("warc_file", StringType(), False),
    StructField("record_id", StringType(), True),
    StructField("warc_type", StringType(), True),
    StructField("target_uri", StringType(), True),
    StructField("warc_date", StringType(), True),
    StructField("content_type", StringType(), True),
    StructField("content_length", LongType(), True),
    StructField("payload", BinaryType(), True),
])


def _make_warc_codec():
    """Pure WARC encode/parse functions, nested for pickle-by-value
    (the multimodal/_make_decoders pattern)."""
    import gzip as _gzip
    import zlib as _zlib

    def _split_gzip_members(data):
        """Yield decompressed gzip members of a multi-member stream (the
        per-record gzip layout crawlers write; decompressobj stops at
        each member boundary and exposes the rest via unused_data). A
        non-gzip input yields itself once."""
        if data[:2] != b"\x1f\x8b":
            yield data
            return
        rest = data
        while rest[:2] == b"\x1f\x8b":
            d = _zlib.decompressobj(wbits=31)
            yield d.decompress(rest) + d.flush()
            rest = d.unused_data

    def parse_warc(data):
        """Parse one (possibly gzipped) WARC byte stream into a list of
        (record_id, warc_type, target_uri, warc_date, content_type,
        content_length, payload) tuples."""
        out = []
        for chunk in _split_gzip_members(data):
            pos = 0
            n = len(chunk)
            while pos < n:
                # skip inter-record CRLFs
                while pos < n and chunk[pos:pos + 2] == b"\r\n":
                    pos += 2
                if pos >= n:
                    break
                head_end = chunk.find(b"\r\n\r\n", pos)
                if head_end < 0:
                    break
                head = chunk[pos:head_end].decode("utf-8",
                                                  errors="replace")
                lines = head.split("\r\n")
                if not lines or not lines[0].startswith("WARC/"):
                    break
                hdr = {}
                for line in lines[1:]:
                    if ":" in line:
                        k, v = line.split(":", 1)
                        hdr[k.strip().lower()] = v.strip()
                length = int(hdr.get("content-length", 0))
                body_start = head_end + 4
                payload = chunk[body_start:body_start + length]
                out.append((
                    hdr.get("warc-record-id"),
                    hdr.get("warc-type"),
                    hdr.get("warc-target-uri"),
                    hdr.get("warc-date"),
                    hdr.get("content-type"),
                    length,
                    payload,
                ))
                pos = body_start + length
        return out

    def encode_warc(records, gzip_per_record=False):
        """records: iterable of dicts with keys warc_type, record_id,
        target_uri, date, content_type, payload (bytes). Returns WARC
        bytes (optionally with each record its own gzip member — the
        crawler-standard layout)."""
        chunks = []
        for r in records:
            payload = r.get("payload", b"") or b""
            head = [b"WARC/1.0"]
            for key, field in (
                    (b"WARC-Type", "warc_type"),
                    (b"WARC-Record-ID", "record_id"),
                    (b"WARC-Target-URI", "target_uri"),
                    (b"WARC-Date", "date"),
                    (b"Content-Type", "content_type")):
                v = r.get(field)
                if v is not None:
                    head.append(key + b": " + str(v).encode())
            head.append(b"Content-Length: " + str(len(payload)).encode())
            rec = (b"\r\n".join(head) + b"\r\n\r\n" + payload
                   + b"\r\n\r\n")
            chunks.append(_gzip.compress(rec) if gzip_per_record else rec)
        return b"".join(chunks)

    return parse_warc, encode_warc


parse_warc, encode_warc = _make_warc_codec()


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: one file per task (`binaryFile` rows ->
    mapInPandas parse). Output: WARC_SCHEMA."""
    parse, _ = _make_warc_codec()

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*").load(path)
             .select("path", "content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse(bytes(content)):
                    rows.append((path_,) + rec)
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WARC_SCHEMA.fields])

    return files.mapInPandas(run, WARC_SCHEMA)


def warc_to_documents(warc: DataFrame) -> DataFrame:
    """Response records -> document rows for the corpus pipeline:
    utf-8 decode, HTTP header strip when present, minimal tag strip and
    whitespace normalization — all JVM column expressions.

    Output: doc_id (xxhash64 of record id + uri), url, text.
    """
    txt = F.decode(F.col("payload"), "UTF-8")
    body = F.when(
        F.instr(txt, "\r\n\r\n") > 0,
        F.expr("substring(decode(payload, 'UTF-8'), "
               "instr(decode(payload, 'UTF-8'), '\\r\\n\\r\\n') + 4)")
    ).otherwise(txt)
    clean = F.trim(F.regexp_replace(
        F.regexp_replace(body, "<[^>]*>", " "), "\\s+", " "))
    return (warc.where(F.col("warc_type") == "response")
            .select(
                F.xxhash64(F.concat_ws("|", "record_id", "target_uri"))
                .alias("doc_id"),
                F.col("target_uri").alias("url"),
                clean.alias("text"))
            .where(F.length("text") > 0))
