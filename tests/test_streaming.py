"""Streaming tests: the watermarked windowed aggregate over the events
stream must converge to the batch answer (kappa check), and the multimodal
mapInPandas plumbing must run end-to-end with the stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stream_converges_to_batch(spark, tmp_path):
    from nexus_spark.catalog import load_table
    from nexus_spark.streaming.events import (read_events_stream,
                                              run_stream_to_memory,
                                              windowed_stats)

    # Replay the events table as a 4-file stream.
    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_stream")
    ev.repartition(4).write.parquet(src)

    stream = read_events_stream(spark, src)
    result = run_stream_to_memory(
        spark, windowed_stats(stream, window="1 hour"), name="t_stream")

    batch = windowed_stats(ev, window="1 hour")
    got = {(str(r["w_start"]), r["event_type"]):
           (r["ev_cnt"], round(r["ev_avg"], 6))
           for r in result.collect()}
    want = {(str(r["w_start"]), r["event_type"]):
            (r["ev_cnt"], round(r["ev_avg"], 6))
            for r in batch.collect()}
    assert got == want
    assert len(want) > 0


def test_streaming_time_series_converges_to_batch(spark, tmp_path):
    """Kappa check for the geo surface: S1 on a replayed obs stream equals
    the batch operator once the stream drains."""
    from nexus_spark import domain
    from nexus_spark.streaming.geo import streaming_time_series

    obs = domain.observations(spark, SF_DIR).where(
        (F.col("time") >= "1995-01-01") & (F.col("time") < "1995-07-01"))
    src = str(tmp_path / "obs_stream")
    obs.repartition(4).write.parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_time_series(stream).writeStream.format("memory")
         .queryName("s1_stream").outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    def key(rows):
        return {(str(r["ts_date"]), r["dataset"]):
                (r["ts_cnt"], None if r["ts_mean"] is None
                 else round(r["ts_mean"], 6)) for r in rows}

    got = key(spark.table("s1_stream").collect())
    want = key(streaming_time_series(obs).collect())
    assert got == want
    assert len(want) > 100


def test_capabilities_registry(spark):
    import nexus_spark

    caps = nexus_spark.capabilities()
    names = {c["name"] for c in caps}
    assert "s1_time_series" in names and "s8_matchup" in names
    assert sum(c["oracle_checked"] for c in caps) >= 45
    assert all(c["callable"].endswith(c["callable"].split(".")[-1])
               for c in caps)


def test_multimodal_features_stub(spark):
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (extract_features,
                                                  media_from_documents)

    docs = load_table(spark, SF_DIR, "documents")
    media = media_from_documents(docs)
    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["feat_dim"] == 16
    assert 0.0 <= r["feat_mean"] <= 1.0
    # Deterministic: same payload → same features on re-run.
    again = {x["media_id"]: x["feat_mean"] for x in feats.collect()}
    assert again[r["media_id"]] == r["feat_mean"]


def test_multimodal_real_decode_raises(spark):
    from nexus_spark.operators.multimodal import decode_image

    # truncated/unknown format (no PNG magic) -> no codec available
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", fake=False)


def test_multimodal_real_decode_end_to_end(spark):
    """The REAL decode path: synthetic_media writes genuine PNG/WAV
    payloads; extract_features must recover the closed-form pixel/sample
    statistics exactly (distributed, Arrow-batched)."""
    import numpy as np

    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (extract_features,
                                                  synthetic_media)

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    feats = {r["media_id"]: r
             for r in extract_features(synthetic_media(docs)).collect()}
    assert len(feats) == 60
    for d, r in feats.items():
        if r["media_type"] == "image":
            n = (4 + (d // 3) % 5) * (4 + (d // 3) % 4) * 3
            v = ((d + 13 * np.arange(n)) % 256) / 255.0
        elif r["media_type"] == "audio":
            n = 64 + d % 32
            v = ((31 * d + 17 * np.arange(n)) % 2001 - 1000) / 32768.0
        else:
            n = 128 + d % 64
            v = ((3 * d + 7 * np.arange(n)) % 256) / 255.0
        assert r["feat_dim"] == n
        assert abs(r["feat_mean"] - v.mean()) < 1e-9, d
        assert abs(r["feat_std"] - v.std()) < 1e-9, d


def test_resize_images_nearest_exact(spark):
    """Nearest-neighbor resize contract: out[i,j] = in[i*h//H, j*w//W],
    checked both downsampling and upsampling through the full
    decode->resize->re-encode round trip."""
    import numpy as np

    from nexus_spark.operators.multimodal import (decode_png, encode_png,
                                                  resize_images)

    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(src)), 10, 6, None),
         (2, "audio", bytearray(b"notpng"), None, None, 42)],
        "media_id long, media_type string, payload binary, width int, "
        "height int, duration_ms long")
    for oh, ow in [(3, 4), (12, 20)]:
        rows = {r["media_id"]: r
                for r in resize_images(media, ow, oh).collect()}
        got = decode_png(bytes(rows[1]["payload"]))
        ys = (np.arange(oh) * 6) // oh
        xs = (np.arange(ow) * 10) // ow
        assert (got == src[ys][:, xs]).all()
        assert (rows[1]["width"], rows[1]["height"]) == (ow, oh)
        # non-image rows pass through untouched
        assert bytes(rows[2]["payload"]) == b"notpng"
        assert rows[2]["duration_ms"] == 42


def test_png_decoder_all_filter_types():
    """From-scratch PNG decoder vs hand-filtered scanlines: every filter
    type (None/Sub/Up/Average/Paeth) and every channel count."""
    import struct
    import zlib

    import numpy as np

    from nexus_spark.operators.multimodal import (decode_png, encode_png,
                                                  decode_wav, encode_wav)

    rng = np.random.default_rng(42)
    for c in (1, 2, 3, 4):
        a = rng.integers(0, 256, (6, 5, c), dtype=np.uint8)
        assert (decode_png(encode_png(a)) == a).all()

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    a = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    rows, prev = [], np.zeros(12, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = a[y].reshape(-1).astype(np.int64)
        enc = np.zeros(12, dtype=np.int64)
        for i in range(12):
            left = line[i - 3] if i >= 3 else 0
            up, ul = prev[i], (prev[i - 3] if i >= 3 else 0)
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else ul)
            enc[i] = (line[i] - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = line
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == a).all()

    s = np.arange(-500, 500, 7, dtype=np.int16)
    assert np.allclose(decode_wav(encode_wav(s)), s / 32768.0)


def test_streaming_scrub_projection(spark, tmp_path):
    """PII stats / repetition are stateless projections -> they run
    unchanged on a document stream (continuous scrubbing at ingest); the
    streamed rows must equal the batch operators exactly."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import pii_stats, repetition_stats
    from nexus_spark.streaming.events import run_stream_to_memory

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_scrub_stream")
    docs.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    got = {r.doc_id: r for r in run_stream_to_memory(
        spark, pii_stats(stream), name="scrub_stream",
        mode="append").collect()}
    want = {r.doc_id: r for r in pii_stats(docs).collect()}
    assert len(got) == len(want) > 0
    for d in list(want)[:50]:
        assert got[d].redacted_fp == want[d].redacted_fp

    got_r = {r.doc_id: r for r in run_stream_to_memory(
        spark, repetition_stats(stream), name="rep_stream",
        mode="append").collect()}
    want_r = {r.doc_id: r for r in repetition_stats(docs).collect()}
    for d in list(want_r)[:50]:
        assert got_r[d].rep_ratio == want_r[d].rep_ratio


def test_streaming_text_curation_projection(spark, tmp_path):
    """The text-analysis surface is a stateless projection, so it applies
    unchanged to a document STREAM — continuous corpus curation. The
    streamed per-doc stats must equal the batch operator exactly."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import text_stats
    from nexus_spark.streaming.events import run_stream_to_memory

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    got = run_stream_to_memory(spark, text_stats(stream),
                               name="doc_curation", mode="append")
    want = {r.doc_id: r for r in text_stats(docs).collect()}
    got_map = {r.doc_id: r for r in got.collect()}
    assert len(got_map) == len(want) > 0
    sample = list(want)[:50]
    for d in sample:
        assert got_map[d].fingerprint == want[d].fingerprint
        assert got_map[d].quality == want[d].quality
        assert got_map[d].lang_pred == want[d].lang_pred


def test_session_stats_streaming_matches_batch_cut(spark, tmp_path):
    """session_window state shape: the append-mode emitted set equals the
    batch gaps-and-islands sessions finalized by the final watermark
    (end = last event + gap, emitted iff end <= max(ts) - delay); a
    session spanning events across micro-batch files must MERGE, and an
    event exactly `gap` after the last still EXTENDS the session
    (per-event windows merge when they touch)."""
    from nexus_spark.streaming.events import session_stats

    rows = [
        # user 1: two events 10 min apart (one session), then a 40-min
        # gap (new session), then one exactly 30 min later (EXTENDS —
        # touching windows merge)
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 00:50:00", 4.0),
        (1, "2024-01-01 01:20:00", 8.0),
        # user 2: single early event; plus the stream's max-ts anchor so
        # the watermark finalizes everything older
        (2, "2024-01-01 00:05:00", 1.5),
        (2, "2024-01-01 05:00:00", 9.9),
    ]
    ev = spark.createDataFrame(
        [(u, t, v) for u, t, v in rows],
        "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    src = str(tmp_path / "sess_stream")
    # two files -> the (1, 00:00) and (1, 00:10) events can land in
    # different micro-batches; session_window must still merge them
    ev.repartition(2).write.parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = session_stats(stream, gap="30 minutes", watermark="30 minutes")
    name = "t_sess_stream"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    got = {(r["user_id"], str(r["session_start"])):
           (r["n_events"], r["session_value"], str(r["session_end"]))
           for r in spark.table(name).collect()}
    # final watermark = 05:00 - 30min = 04:30; every user-1 session ends
    # (last+30min) before 04:30 -> emitted; user 2's 00:05 session too;
    # the 05:00 anchor session is NOT finalized (end 05:30 > 04:30)
    assert got == {
        (1, "2024-01-01 00:00:00"): (2, 3.0, "2024-01-01 00:40:00"),
        (1, "2024-01-01 00:50:00"): (2, 12.0, "2024-01-01 01:50:00"),
        (2, "2024-01-01 00:05:00"): (1, 1.5, "2024-01-01 00:35:00"),
    }

    # static path: same code yields ALL sessions (incl. the anchor)
    batch = {(r["user_id"], str(r["session_start"]))
             for r in session_stats(ev).collect()}
    assert batch == set(got) | {(2, "2024-01-01 05:00:00")}


def test_drift_counts_are_batching_independent(spark, tmp_path):
    """Micro-batch boundaries must not change the merged drift counts:
    drain the same rows as 1 file and as 4 files, merge, compare."""
    from nexus_spark.streaming.drift import (merged_counts,
                                             stream_category_counts)

    rows = [(i, i % 3, i % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, day long, score int")
    merged = {}
    for nfiles in (1, 4):
        feed = str(tmp_path / f"feed{nfiles}")
        df.repartition(nfiles).write.parquet(feed)
        out = str(tmp_path / f"out{nfiles}")
        ckpt = str(tmp_path / f"ckpt{nfiles}")
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(feed)
                  .select("day", "score"))
        q = stream_category_counts(stream, ["day", "score"], out, ckpt)
        assert q.awaitTermination(120)
        merged[nfiles] = {(r["day"], r["score"]): r["cnt"]
                          for r in merged_counts(
                              spark, out, ["day", "score"]).collect()}
    assert merged[1] == merged[4]
    assert sum(merged[1].values()) == 200


def test_psi_vs_baseline_zero_on_identical_distribution(spark):
    from nexus_spark.streaming.drift import psi_vs_baseline

    base = spark.createDataFrame([(0, 10), (1, 30)], "score int, cnt long")
    obs = spark.createDataFrame(
        [(0, 0, 20), (0, 1, 60),   # day 0: same shape as baseline
         (1, 0, 30), (1, 1, 10)],  # day 1: inverted
        "day long, score int, cnt long")
    rows = {(r["day"], r["score"]): r for r in
            psi_vs_baseline(base, obs).collect()}
    # identical shape: smoothing keeps PSI near zero but tiny, not exact
    assert abs(rows[(0, 0)]["psi"]) < 1e-3
    # inverted shape: large positive PSI
    assert rows[(1, 0)]["psi"] > 0.5
    # psi is the per-day sum of terms
    for day in (0, 1):
        assert abs(sum(rows[(day, s)]["psi_term"] for s in (0, 1))
                   - rows[(day, 0)]["psi"]) < 1e-12
