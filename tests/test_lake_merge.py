"""CDC merge tests: merge_upsert latest-wins/delete/insert semantics and
the physical partition-pruned merge_into_partitions path (only touched
partitions rewritten, untouched partitions byte-identical)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_upsert_semantics(spark):
    from nexus_spark.sources.lake import merge_upsert

    base = _docs(spark, [(1, "one"), (2, "two"), (3, "three")])
    ups = spark.createDataFrame(
        [(2, "two-v2", 1, "U"),      # update
         (3, "ignored", 1, "U"),     # superseded by the seq-2 delete
         (3, None, 2, "D"),          # delete wins (higher seq)
         (4, "four", 1, "U")],       # insert
        "doc_id long, text string, seq int, op string")
    got = {r.doc_id: r.text
           for r in merge_upsert(base, ups, ["doc_id"]).collect()}
    assert got == {1: "one", 2: "two-v2", 4: "four"}


def test_merge_upsert_latest_wins_within_key(spark):
    from nexus_spark.sources.lake import merge_upsert

    base = _docs(spark, [(1, "v0")])
    ups = spark.createDataFrame(
        [(1, "v1", 1, "U"), (1, "v2", 2, "U"), (1, "v3", 3, "U")],
        "doc_id long, text string, seq int, op string")
    got = merge_upsert(base, ups, ["doc_id"]).collect()
    assert [(r.doc_id, r.text) for r in got] == [(1, "v3")]


def test_merge_upsert_delete_then_reinsert(spark):
    from nexus_spark.sources.lake import merge_upsert

    base = _docs(spark, [(1, "v0")])
    ups = spark.createDataFrame(
        [(1, None, 1, "D"), (1, "back", 2, "U")],
        "doc_id long, text string, seq int, op string")
    got = merge_upsert(base, ups, ["doc_id"]).collect()
    assert [(r.doc_id, r.text) for r in got] == [(1, "back")]


def test_merge_into_partitions_prunes_and_applies(spark, tmp_path):
    from nexus_spark import domain
    from nexus_spark.sources.lake import (merge_into_partitions,
                                          read_observations,
                                          write_observations)

    path = str(tmp_path / "obs")
    obs = domain.observations(spark, SF_DIR).where(
        F.col("time") < "1995-02-01")
    write_observations(obs, path)
    before = read_observations(spark, path)
    n_before = before.count()

    # One touched (dataset, date): bump every value by +100 via upsert.
    touched = before.where(
        (F.col("dataset") == "sst_a")
        & (F.to_date("time") == "1995-01-03"))
    # Materialize BEFORE the merge: lazy plans over `path` re-list the
    # files the overwrite replaces.
    old_rows = touched.collect()
    n_touched = len(old_rows)
    assert n_touched > 0
    expected = {(r.time, r.lat, r.lon): r.value + 100.0 for r in old_rows}
    ups = (spark.createDataFrame(old_rows, touched.schema)
           .withColumn("value", F.col("value") + 100.0)
           .withColumn("seq", F.lit(1)).withColumn("op", F.lit("U")))

    # Snapshot an UNTOUCHED partition's file listing to prove pruning.
    other_dir = os.path.join(path, "dataset=sst_a", "obs_date=1995-01-05")
    files_before = sorted(os.listdir(other_dir))
    mtimes_before = [os.path.getmtime(os.path.join(other_dir, f))
                     for f in files_before]

    n_parts = merge_into_partitions(spark, path, ups)
    assert n_parts == 1

    after = read_observations(spark, path)
    assert after.count() == n_before  # pure update: no rows added/lost
    bumped = after.where(
        (F.col("dataset") == "sst_a")
        & (F.to_date("time") == "1995-01-03")).collect()
    assert len(bumped) == n_touched
    # every touched row got the +100
    for r in bumped:
        assert abs(expected[(r.time, r.lat, r.lon)] - r.value) < 1e-9
    # untouched partition not rewritten
    assert sorted(os.listdir(other_dir)) == files_before
    assert [os.path.getmtime(os.path.join(other_dir, f))
            for f in files_before] == mtimes_before
