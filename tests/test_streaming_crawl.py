"""Streaming WARC crawl ingest: archives dropped in a watched dir parse
through the same from-scratch WARC parser as the batch reader, extraction
and PII scrubbing equal the batch pipeline, a second trigger run ingests
ONLY new archives (checkpoint exactly-once)."""

from __future__ import annotations

from nexus_spark.sources.warc import encode_warc


def _archive(start: int, n: int = 4) -> bytes:
    recs = []
    for i in range(start, start + n):
        body = (f"HTTP/1.1 200 OK\r\n\r\n<html><body>doc {i} text "
                f"mail u{i}@ex.org here</body></html>").encode()
        recs.append({"warc_type": "response",
                     "record_id": f"<urn:uuid:r{i}>",
                     "target_uri": f"https://e.org/{i}",
                     "date": "2026-01-01T00:00:00Z",
                     "content_type": "application/http; msgtype=response",
                     "payload": body})
    return encode_warc(recs, gzip_per_record=True)


def test_stream_crawl_matches_batch_and_is_exactly_once(spark, tmp_path):
    from nexus_spark.operators.scrub import redact_pii
    from nexus_spark.sources.warc import read_warc, warc_to_documents
    from nexus_spark.streaming.crawl import (crawl_to_lake,
                                             stream_crawl_documents)

    watch = tmp_path / "incoming"
    watch.mkdir()
    lake = str(tmp_path / "doc_lake")
    ckpt = str(tmp_path / "ckpt")

    (watch / "a0.warc.gz").write_bytes(_archive(0))
    (watch / "a1.warc.gz").write_bytes(_archive(4))

    q = crawl_to_lake(stream_crawl_documents(spark, str(watch)),
                      lake, ckpt)
    q.awaitTermination(120)
    got = {r["url"]: r["text"]
           for r in spark.read.parquet(lake).collect()}
    want = {r["url"]: r["text"] for r in
            redact_pii(warc_to_documents(
                read_warc(spark, str(watch)))).collect()}
    assert got == want and len(got) == 8
    assert all("<EMAIL>" in t and "@" not in t.replace("<EMAIL>", "")
               for t in got.values())

    # second trigger: only the NEW archive lands (no re-ingest of a0/a1)
    (watch / "a2.warc.gz").write_bytes(_archive(8))
    q2 = crawl_to_lake(stream_crawl_documents(spark, str(watch)),
                       lake, ckpt)
    q2.awaitTermination(120)
    after = spark.read.parquet(lake).count()
    assert after == 12
