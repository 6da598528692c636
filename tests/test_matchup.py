"""Matchup unit tests with a priori known geometry — semantic port of the
reference's matchup test cases (exact-colocated, within-radius,
outside-radius, within-radius-but-outside-time, match-once nearest;
reference: analysis/tests/algorithms_spark/Matchup_test.py:15-183 — the
tests are re-derived from the documented semantics, not copied)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from nexus_spark.operators.matchup import matchup

T0 = dt.datetime(2020, 1, 1, 12, 0, 0)


def _p(pid, lat, lon, t=T0, v=1.0):
    return Row(primary_id=pid, time=t, lat=lat, lon=lon, value=v)


def _s(sid, lat, lon, t=T0, v=2.0):
    return Row(secondary_id=sid, time=t, lat=lat, lon=lon, value=v)


@pytest.fixture(scope="module")
def frames(spark):
    def build(primaries, secondaries):
        return (spark.createDataFrame(primaries),
                spark.createDataFrame(secondaries))
    return build


def test_exact_colocated_matches(spark, frames):
    p, s = frames([_p(1, 10.0, 20.0)], [_s(101, 10.0, 20.0)])
    out = matchup(p, s, radius_km=1.0, time_tolerance_s=60).collect()
    assert len(out) == 1
    assert out[0]["dist_km"] == 0.0


def test_within_radius_matches_outside_does_not(spark, frames):
    # ~0.9 km north (0.008°) matches at rt=1 km; ~150 km away does not.
    p, s = frames(
        [_p(1, 10.0, 20.0)],
        [_s(101, 10.008, 20.0), _s(102, 11.35, 20.0)],
    )
    out = matchup(p, s, radius_km=1.0, time_tolerance_s=60).collect()
    assert [r["secondary_id"] for r in out] == [101]
    out150 = matchup(p, s, radius_km=160.0, time_tolerance_s=60).collect()
    assert {r["secondary_id"] for r in out150} == {101, 102}


def test_time_tolerance_excludes(spark, frames):
    late = T0 + dt.timedelta(seconds=7200)
    p, s = frames(
        [_p(1, 10.0, 20.0)],
        [_s(101, 10.0, 20.0, t=late)],
    )
    assert matchup(p, s, radius_km=1.0, time_tolerance_s=3600).count() == 0
    assert matchup(p, s, radius_km=1.0, time_tolerance_s=7200).count() == 1


def test_match_once_keeps_nearest(spark, frames):
    p, s = frames(
        [_p(1, 0.0, 0.0)],
        [_s(101, 0.02, 0.0), _s(102, 0.01, 0.0), _s(103, 0.03, 0.0)],
    )
    out = matchup(p, s, radius_km=10.0, time_tolerance_s=60,
                  match_once=True).collect()
    assert len(out) == 1
    assert out[0]["secondary_id"] == 102


def test_antimeridian_wrap(spark, frames):
    # 179.99°E and -179.99°W are ~2.2 km apart at the equator — the modular
    # lon-cell wrap must find this pair.
    p, s = frames([_p(1, 0.0, 179.99)], [_s(101, 0.0, -179.99)])
    out = matchup(p, s, radius_km=5.0, time_tolerance_s=60).collect()
    assert len(out) == 1
    assert out[0]["dist_km"] < 5.0


def test_high_latitude_lon_span(spark, frames):
    # At 80°N, 5° of longitude is only ~97 km — the latitude-dependent
    # neighbor span must cover it when the radius is 100 km.
    p, s = frames([_p(1, 80.0, 0.0)], [_s(101, 80.0, 5.0)])
    out = matchup(p, s, radius_km=100.0, time_tolerance_s=60).collect()
    assert len(out) == 1


def test_no_duplicate_pairs_from_bucket_explode(spark, frames):
    # A pair near a cell corner + near a time-bucket edge must appear once.
    p, s = frames(
        [_p(1, 9.999, 19.999)],
        [_s(101, 10.001, 20.001, t=T0 + dt.timedelta(seconds=59))],
    )
    out = matchup(p, s, radius_km=5.0, time_tolerance_s=60).collect()
    assert len(out) == 1


def test_asof_join_semantics(spark):
    """Generic keyed as-of join: latest right at-or-before (ties at
    equal ts MATCH), tolerance nulls out stale matches, left rows with
    no prior right stay NULL, one output row per left row."""
    from pyspark.sql import functions as F

    from nexus_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 205, "l2"), (1, 200, "l3"),
         (2, 50, "l4"), (2, 400, "l5")],
        "k long, t long, lbl string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "lbl")
    right = spark.createDataFrame(
        [(1, 90, 900), (1, 200, 920), (2, 399, 930)],
        "k long, t long, rv long").select(
        "k", F.timestamp_seconds("t").alias("ts"), "rv")

    out = asof_join(left, right, ["k"], "ts", ["rv"], tolerance_s=60)
    got = {r.lbl: (r.rv, r.asof_ts) for r in out.collect()}
    assert len(got) == 5
    assert got["l1"][0] == 900          # 90 <= 100, within 60s
    assert got["l3"][0] == 920          # tie at ts=200 matches (<=)
    assert got["l2"][0] == 920          # 200 <= 205
    assert got["l4"] == (None, None)    # no right at-or-before
    assert got["l5"][0] == 930          # 399 <= 400, within 60s

    stale = asof_join(left, right, ["k"], "ts", ["rv"], tolerance_s=4)
    got2 = {r.lbl: r.rv for r in stale.collect()}
    assert got2["l1"] is None           # 10s gap > 4s tolerance
    assert got2["l3"] == 920            # 0s gap still in
    assert got2["l2"] is None           # 5s gap > 4s tolerance


def test_asof_nearest_picks_closer_side(spark):
    """Two-sided nearest: closer side wins, equidistant ties resolve to
    the EARLIER right row, tolerance applies per direction, and a key
    with right rows only after the left ts still matches forward."""
    from pyspark.sql import functions as F

    from nexus_spark.operators.asof import asof_nearest

    left = spark.createDataFrame(
        [(1, 100, "l1"),   # b at 90 (10s), f at 140 (40s) -> backward
         (1, 130, "l2"),   # b at 90 (40s), f at 140 (10s) -> forward
         (1, 115, "l3"),   # equidistant 90/140 (25s) -> earlier (90)
         (2, 50, "l4")],   # only forward right at 60
        "k long, t long, lbl string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "lbl")
    right = spark.createDataFrame(
        [(1, 90, 900), (1, 140, 901), (2, 60, 902)],
        "k long, t long, rv long").select(
        "k", F.timestamp_seconds("t").alias("ts"), "rv")

    out = asof_nearest(left, right, ["k"], "ts", ["rv"]).select(
        "lbl", "rv", F.col("nearest_ts").cast("timestamp").cast("long")
        .alias("nt"))
    got = {r.lbl: (r.rv, r.nt) for r in out.collect()}
    assert got["l1"] == (900, 90)
    assert got["l2"] == (901, 140)
    assert got["l3"] == (900, 90)    # tie -> earlier
    assert got["l4"] == (902, 60)    # forward-only match

    tol = asof_nearest(left, right, ["k"], "ts", ["rv"], tolerance_s=12)
    got2 = {r.lbl: r.rv for r in tol.collect()}
    assert got2["l1"] == 900         # 10s in tolerance
    assert got2["l2"] == 901         # 10s forward in tolerance
    assert got2["l3"] is None        # both sides 25s > 12s
    assert got2["l4"] == 902         # 10s forward


def test_asof_join_null_payload_is_atomic(spark):
    """A matched right row with a NULL payload VALUE must carry that
    NULL — not skip back to an older right row's value for that column
    while other columns carry the newer match (the frankenrow bug: the
    carry must move one struct per right row, not one last() per
    column)."""
    from pyspark.sql import functions as F

    from nexus_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 300, "l1")], "k long, t long, lbl string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "lbl")
    # older right row has BOTH payloads; the newest (matching) right row
    # has rv=NULL but rw set — output must be (NULL, 21), asof_ts=200.
    right = spark.createDataFrame(
        [(1, 100, 11, 10), (1, 200, None, 21)],
        "k long, t long, rv long, rw long").select(
        "k", F.timestamp_seconds("t").alias("ts"), "rv", "rw")

    out = asof_join(left, right, ["k"], "ts", ["rv", "rw"]).select(
        "rv", "rw", F.col("asof_ts").cast("timestamp").cast("long")
        .alias("asof_epoch"))
    row = out.collect()[0]
    assert row.rw == 21
    assert row.rv is None, "per-column carry skipped back to stale rv"
    assert row.asof_epoch == 200
