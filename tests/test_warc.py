"""WARC source: from-scratch parser vs our encoder (plain, whole-file
gzip, per-record gzip members), distributed read, and the
response->documents extraction feeding the corpus pipeline."""

from __future__ import annotations

import gzip

from nexus_spark.sources.warc import encode_warc, parse_warc


def _sample_records(n=6):
    recs = []
    for i in range(n):
        body = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                f"<html><body><h1>Doc {i}</h1>"
                f"<p>hello   world {i} from <b>warc</b></p></body></html>"
                ).encode()
        recs.append({
            "warc_type": "response" if i % 3 != 2 else "request",
            "record_id": f"<urn:uuid:rec-{i}>",
            "target_uri": f"https://example.org/page/{i}",
            "date": "2026-01-01T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": body,
        })
    return recs


def test_warc_roundtrip_plain_and_gzip():
    recs = _sample_records()
    for raw in (encode_warc(recs),
                gzip.compress(encode_warc(recs)),          # whole-file gz
                encode_warc(recs, gzip_per_record=True)):  # member-per-rec
        got = parse_warc(raw)
        assert len(got) == len(recs)
        for want, (rid, wtype, uri, date, ctype, length, payload) \
                in zip(recs, got):
            assert rid == want["record_id"]
            assert wtype == want["warc_type"]
            assert uri == want["target_uri"]
            assert date == "2026-01-01T00:00:00Z"
            assert length == len(want["payload"])
            assert payload == want["payload"]


def test_warc_parse_is_length_delimited():
    # payload containing CRLF CRLF and a fake WARC/ header must NOT split
    # the record: the parser trusts Content-Length, as the spec requires.
    tricky = b"x\r\n\r\nWARC/1.0\r\nfake: yes\r\n\r\nmore"
    recs = [{"warc_type": "resource", "record_id": "<urn:uuid:t>",
             "target_uri": "https://e.org/t", "date": "2026-01-01T00:00:00Z",
             "content_type": "text/plain", "payload": tricky},
            {"warc_type": "resource", "record_id": "<urn:uuid:u>",
             "target_uri": "https://e.org/u", "date": "2026-01-01T00:00:00Z",
             "content_type": "text/plain", "payload": b"second"}]
    got = parse_warc(encode_warc(recs))
    assert [r[6] for r in got] == [tricky, b"second"]


def test_read_warc_distributed_and_documents(spark, tmp_path):
    from nexus_spark.sources.warc import read_warc, warc_to_documents

    recs = _sample_records(9)
    # three archives -> three parallel parse tasks
    for part in range(3):
        chunk = recs[part * 3:(part + 1) * 3]
        mode = [False, True, False][part]
        data = encode_warc(chunk, gzip_per_record=mode)
        if part == 2:
            data = gzip.compress(data)
        (tmp_path / f"crawl-{part}.warc{'.gz' if part else ''}"
         ).write_bytes(data)

    warc = read_warc(spark, str(tmp_path))
    rows = warc.collect()
    assert len(rows) == 9
    assert {r["warc_type"] for r in rows} == {"response", "request"}
    assert all(r["content_length"] == len(r["payload"]) for r in rows)

    docs = warc_to_documents(warc).collect()
    # 2 of each 3 records are responses
    assert len(docs) == 6
    by_url = {d["url"]: d for d in docs}
    d0 = by_url["https://example.org/page/0"]
    # HTTP headers stripped, tags stripped, whitespace collapsed
    assert d0["text"] == "Doc 0 hello world 0 from warc"
    assert "Content-Type" not in d0["text"]
    assert len({d["doc_id"] for d in docs}) == 6  # distinct stable ids


def test_warc_documents_feed_dedup_pipeline(spark, tmp_path):
    """The extracted documents run the standard curation ops unchanged —
    WARC is a drop-in corpus source."""
    from nexus_spark.operators.dedup import exact_duplicates
    from nexus_spark.sources.warc import read_warc, warc_to_documents

    recs = _sample_records(6)
    # plant an exact duplicate of page 0's payload at a new URI
    recs.append(dict(recs[0], record_id="<urn:uuid:dup>",
                     target_uri="https://mirror.example.org/page/0"))
    (tmp_path / "c.warc").write_bytes(encode_warc(recs))
    docs = warc_to_documents(read_warc(spark, str(tmp_path)))
    dups = exact_duplicates(docs).collect()
    assert any(r["dup_cnt"] == 2 for r in dups)
