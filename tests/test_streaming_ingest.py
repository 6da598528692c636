"""Streaming granule ingest + streaming dedup tests.

Ingest: granules dropped in a watched dir are tiled by the same NetCDF
parser as the batch reader and appended to the lake through the same
writer — so the streamed lake equals the batch-ingested one, and a second
trigger run ingests ONLY new granules (checkpoint exactly-once).

Dedup: streaming exact dedup converges to the batch keep-set
(kappa check against operators/dedup.exact_duplicates).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nexus_spark.plans.render import to_netcdf


def _granule(seed: int) -> bytes:
    """Deterministic 4x3 grid granule; value depends on seed so granules
    are distinguishable in the lake."""
    rng = np.random.RandomState(seed)
    return to_netcdf({
        "lats": [10.0, 20.0, 30.0, 40.0],
        "lons": [100.0, 110.0, 120.0],
        "grid": rng.rand(4, 3) * 10.0,
    }, var_name="sst", units="degC")


def _run_ingest(spark, watch, lake, ckpt):
    from nexus_spark.streaming.ingest import ingest_to_lake, stream_granules

    rows = stream_granules(spark, str(watch), variable="sst",
                           dataset="stream_sst",
                           tile_shape={"lat": 2, "lon": 2})
    q = ingest_to_lake(rows, str(lake), str(ckpt))
    q.awaitTermination(120)


def test_stream_ingest_tiles_granules_into_lake(spark, tmp_path):
    from nexus_spark.sources.lake import read_observations

    watch = tmp_path / "watch"
    watch.mkdir()
    (watch / "g1.nc").write_bytes(_granule(1))
    (watch / "g2.nc").write_bytes(_granule(2))
    (watch / "ignore.txt").write_bytes(b"not a granule")

    _run_ingest(spark, watch, tmp_path / "lake", tmp_path / "ckpt")

    got = read_observations(spark, str(tmp_path / "lake"))
    # 2 granules x 12 cells, all under dataset=stream_sst
    assert got.count() == 24
    assert got.select("dataset").distinct().collect()[0][0] == "stream_sst"
    # Values survive the tile_shape={"lat":2,"lon":2} slicing intact:
    # each granule contributes its full value set.
    vals = {round(r.value, 6) for r in got.collect()}
    assert len(vals) == 24

    # Incremental run: one NEW granule -> exactly 12 new rows, old rows
    # not re-ingested (checkpoint exactly-once).
    (watch / "g3.nc").write_bytes(_granule(3))
    _run_ingest(spark, watch, tmp_path / "lake", tmp_path / "ckpt")
    assert read_observations(spark, str(tmp_path / "lake")).count() == 36


def test_stream_ingest_layout_matches_batch_writer(spark, tmp_path):
    """The streamed lake must use the batch writer's partition layout so
    every downstream operator (pruning included) works unchanged."""
    import os

    watch = tmp_path / "watch"
    watch.mkdir()
    (watch / "g1.nc").write_bytes(_granule(7))
    _run_ingest(spark, watch, tmp_path / "lake", tmp_path / "ckpt")

    assert os.path.isdir(str(tmp_path / "lake" / "dataset=stream_sst"))
    sub = os.listdir(str(tmp_path / "lake" / "dataset=stream_sst"))
    assert any(e.startswith("obs_date=") for e in sub)


def test_streaming_exact_dedup_matches_batch_keepset(spark, tmp_path):
    from nexus_spark.operators.dedup import exact_duplicates
    from nexus_spark.streaming.dedup import streaming_exact_dedup

    docs = spark.createDataFrame(
        [(i, f"doc body {i % 7}", f"2024-01-01 00:{i:02d}:00")
         for i in range(40)],
        "doc_id long, text string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    # Horizon must cover the 40-minute data span: duplicates farther apart
    # than the watermark are legitimately re-admitted (state was evicted).
    q = (streaming_exact_dedup(stream, watermark="2 hours")
         .writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("dedup_stream").collect()
    # One survivor per distinct content hash (7 distinct bodies), same
    # key-set as the batch dedup operator.
    want_hashes = {r.content_hash for r in exact_duplicates(docs).collect()}
    assert {r.content_hash for r in got} == want_hashes
    assert len(got) == 7

    # Batch path of the same function = plain dropDuplicates.
    assert streaming_exact_dedup(docs).count() == 7


def test_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState seen-set: exactly one emission per hash
    across micro-batches, duplicates in later batches suppressed."""
    from nexus_spark.streaming.dedup import first_seen

    docs = spark.createDataFrame(
        [(i, f"text {i % 5}") for i in range(30)],
        "doc_id long, text string")
    src = str(tmp_path / "fs_stream")
    docs.repartition(3).write.parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (first_seen(stream).writeStream.format("memory")
         .queryName("fs_stream").outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("fs_stream").collect()
    assert len(got) == 5  # one per distinct text, ever
    assert len({r.content_hash for r in got}) == 5


def test_cdc_compact_is_batching_independent(spark):
    """Tombstone retention makes the apply order-independent: a
    late-arriving lower-seq update must NOT resurrect a deleted key,
    and any batch partitioning converges to the global latest-wins
    merge."""
    from nexus_spark.streaming.ingest import cdc_compact

    base = spark.createDataFrame(
        [(1, "one", 0, "U"), (2, "two", 0, "U"), (3, "three", 0, "U")],
        "doc_id long, text string, seq int, op string")
    # change set: delete key 2 (seq 2) + stale update to key 2 (seq 1),
    # update key 3 (seq 1), insert key 4 (seq 1)
    c_del = spark.createDataFrame([(2, None, 2, "D")], base.schema)
    c_stale = spark.createDataFrame([(2, "two-v1", 1, "U")], base.schema)
    c_upd = spark.createDataFrame([(3, "three-v1", 1, "U")], base.schema)
    c_ins = spark.createDataFrame([(4, "four", 1, "U")], base.schema)

    def final(state):
        return sorted((r.doc_id, r.text) for r in state.collect()
                      if r.op != "D")

    # order A: delete arrives first, stale update later
    sa = cdc_compact(base, c_del, ["doc_id"])
    sa = cdc_compact(sa, c_stale.unionByName(c_upd), ["doc_id"])
    sa = cdc_compact(sa, c_ins, ["doc_id"])
    # order B: everything in one batch
    sb = cdc_compact(
        base, c_del.unionByName(c_stale).unionByName(c_upd)
        .unionByName(c_ins), ["doc_id"])
    expect = [(1, "one"), (3, "three-v1"), (4, "four")]
    assert final(sa) == expect
    assert final(sb) == expect


def test_cdc_apply_enforces_retention_contract(spark, tmp_path):
    """keep_versions < 2 would let pruning delete the one snapshot a
    concurrent reader's lazily-executed plan still references — the
    apply must refuse it up front."""
    import pytest

    from nexus_spark.streaming.ingest import stream_cdc_apply

    schema = "doc_id long, text string, seq int, op string"
    feed = str(tmp_path / "feed")
    spark.createDataFrame([(1, "one", 1, "U")], schema) \
        .write.parquet(feed)
    stream = (spark.readStream
              .schema(spark.read.parquet(feed).schema).parquet(feed))
    with pytest.raises(ValueError, match="keep_versions"):
        stream_cdc_apply(stream, str(tmp_path / "state"),
                         str(tmp_path / "ckpt"), ["doc_id"],
                         keep_versions=1)


def test_cdc_commit_is_o_batch_and_crash_safe(spark, tmp_path):
    """Merge-on-read commit protocol: each micro-batch lands as ONE
    delta directory (O(batch) — no base rewrite), the live view is
    latest-wins over base ∪ pending deltas, and an interrupted write (a
    directory WITHOUT the committer's _SUCCESS marker) is invisible to
    readers."""
    import os

    from nexus_spark.streaming.ingest import (read_cdc_state,
                                              resolve_cdc_sources,
                                              stream_cdc_apply)

    state_dir = str(tmp_path / "state")
    schema = "doc_id long, text string, seq int, op string"
    base = spark.createDataFrame(
        [(1, "one", 0, "U"), (2, "two", 0, "U")], schema)
    base.write.parquet(state_dir)
    # seeded layout: root base, no pending deltas
    assert resolve_cdc_sources(spark, state_dir) == (state_dir, [])

    feed = str(tmp_path / "feed")
    spark.createDataFrame([(2, "two-v1", 1, "U"), (3, "three", 1, "U")],
                          schema).write.parquet(feed)
    stream = (spark.readStream.schema(base.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    q = stream_cdc_apply(stream, state_dir, str(tmp_path / "ckpt"),
                         ["doc_id"])
    assert q.awaitTermination(120)
    b, pend = resolve_cdc_sources(spark, state_dir)
    # commits are delta-appends: the base was NOT rewritten
    assert b == state_dir and len(pend) >= 1
    live = {(r.doc_id, r.text)
            for r in read_cdc_state(spark, state_dir).collect()}
    assert live == {(1, "one"), (2, "two-v1"), (3, "three")}

    # simulate a crash mid-commit: a partial delta with data but NO
    # _SUCCESS marker — invisible to readers
    partial = str(tmp_path / "state" / "d00000099")
    spark.createDataFrame([(9, "garbage", 9, "U")], schema) \
        .write.parquet(partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    assert f"{state_dir}/d00000099" not in \
        resolve_cdc_sources(spark, state_dir)[1]
    live2 = {(r.doc_id, r.text)
             for r in read_cdc_state(spark, state_dir).collect()}
    assert live2 == live

    # a later apply (fresh checkpoint = worst-case replay) appends on
    # top; duplicate application collapses under latest-wins
    spark.createDataFrame([(1, None, 2, "D")], schema) \
        .write.mode("append").parquet(feed)
    stream2 = (spark.readStream.schema(base.schema)
               .option("maxFilesPerTrigger", 1).parquet(feed))
    q2 = stream_cdc_apply(stream2, state_dir, str(tmp_path / "ckpt2"),
                          ["doc_id"])
    assert q2.awaitTermination(120)
    final = {(r.doc_id, r.text)
             for r in read_cdc_state(spark, state_dir).collect()}
    assert (9, "garbage") not in final
    assert (1, "one") not in final  # tombstoned
    assert (2, "two-v1") in final and (3, "three") in final


def test_cdc_partial_fold_is_invisible(spark, tmp_path):
    """A crash mid-FOLD (a v{D} base directory without _SUCCESS) must
    not change the live view: readers keep resolving the previous base
    plus ALL pending deltas, including the ones the interrupted fold
    was about to cover."""
    import os

    from nexus_spark.streaming.ingest import (read_cdc_state,
                                              resolve_cdc_sources,
                                              stream_cdc_apply)

    state_dir = str(tmp_path / "state")
    schema = "doc_id long, text string, seq int, op string"
    spark.createDataFrame([(1, "one", 0, "U")], schema) \
        .write.parquet(state_dir)
    feed = str(tmp_path / "feed")
    spark.createDataFrame([(1, "one-v1", 1, "U"), (2, "two", 1, "U")],
                          schema).write.parquet(feed)
    stream = (spark.readStream
              .schema(spark.read.parquet(feed).schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    q = stream_cdc_apply(stream, state_dir, str(tmp_path / "ckpt"),
                         ["doc_id"])
    assert q.awaitTermination(120)
    live = {(r.doc_id, r.text)
            for r in read_cdc_state(spark, state_dir).collect()}
    assert live == {(1, "one-v1"), (2, "two")}

    # interrupted fold: a base claiming to cover every delta, no marker
    deltas = resolve_cdc_sources(spark, state_dir)[1]
    top = max(int(p.rsplit("d", 1)[1]) for p in deltas)
    partial = str(tmp_path / "state" / f"v{top:08d}")
    spark.createDataFrame([(9, "garbage", 9, "U")], schema) \
        .write.parquet(partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    base, pend = resolve_cdc_sources(spark, state_dir)
    assert base == state_dir and len(pend) == len(deltas)
    assert {(r.doc_id, r.text)
            for r in read_cdc_state(spark, state_dir).collect()} == live


def test_cdc_fold_compacts_and_prunes_covered_deltas(spark, tmp_path):
    """Compaction contract: once `compact_every` deltas are pending, the
    commit folds them into a base snapshot v{D} (D = highest folded
    delta); bases beyond keep_versions are pruned, and a delta is
    deleted only when the OLDEST retained base covers it — so every
    retained base still serves its full live view."""
    import os

    from nexus_spark.streaming.ingest import (read_cdc_state,
                                              resolve_cdc_sources,
                                              stream_cdc_apply)

    state_dir = str(tmp_path / "state")
    schema = "doc_id long, text string, seq int, op string"
    spark.createDataFrame(
        [(i, f"t{i}", 0, "U") for i in range(6)], schema) \
        .write.parquet(state_dir)

    feed = str(tmp_path / "feed")
    for i in range(6):
        op = "D" if i % 3 == 2 else "U"
        spark.createDataFrame([(i, f"t{i}-v1", 1, op)], schema) \
            .write.mode("append").parquet(feed)
    stream = (spark.readStream
              .schema(spark.read.parquet(feed).schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    q = stream_cdc_apply(stream, state_dir, str(tmp_path / "ckpt"),
                         ["doc_id"], compact_every=2, keep_versions=2)
    assert q.awaitTermination(120)

    # 6 single-file batches at compact_every=2 -> folds committed;
    # with keep_versions=2 the two newest bases are retained and every
    # delta covered by the OLDER retained base is pruned
    names = sorted(os.listdir(state_dir))
    vs = [n for n in names if n.startswith("v")]
    ds = [n for n in names if n.startswith("d") and n != "_cdc_spec.json"]
    assert len(vs) == 2
    oldest_retained = int(vs[0][1:])
    assert all(int(n[1:]) > oldest_retained for n in ds)

    live = {(r.doc_id, r.text)
            for r in read_cdc_state(spark, state_dir).collect()}
    # deletes (i=2, 5) tombstoned; everything else updated to -v1
    assert live == {(i, f"t{i}-v1") for i in range(6) if i % 3 != 2}
