"""Off-grid gaussian interpolation: brute-force parity + plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nexus_spark.operators.climatology_batch import gaussian_interp_to


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        # (lat, lon, value, time) — irregular scatter incl. a NULL value
        (10.0, 20.0, 1.0, "2020-01-01"),
        (10.4, 20.3, 2.0, "2020-01-11"),
        (11.2, 19.5, 4.0, "2020-01-21"),
        (10.1, 20.1, None, "2020-01-05"),
        (14.9, 20.0, 8.0, "2020-01-01"),   # far in lat
        (10.0, 27.0, 16.0, "2020-01-01"),  # far in lon
    ]
    return (spark.createDataFrame(
        rows, "lat double, lon double, value double, time string")
        .withColumn("time", F.to_timestamp("time")))


def _brute(rows, out_lat, out_lon, wlat, wlon, slat, slon,
           stime_days=None, vfactor=-0.6931):
    """Independent reimplementation of the gaussInterp kernel contract."""
    live = [r for r in rows if r[2] is not None]
    if stime_days is not None:
        secs = [r[4] for r in live]
        mid = (min(secs) + max(secs)) / 2.0
    num = den = n = 0.0
    for lat, lon, v, _, s in live:
        if abs(lat - out_lat) > wlat / 2 or abs(lon - out_lon) > wlon / 2:
            continue
        arg = ((lat - out_lat) / slat) ** 2 + ((lon - out_lon) / slon) ** 2
        if stime_days is not None:
            arg += ((s - mid) / 86400.0 / stime_days) ** 2
        w = math.exp(vfactor * arg)
        num, den, n = num + w * v, den + w, n + 1
    return (num / den if den else None), den, n


def test_offgrid_matches_bruteforce(spark, pts):
    targets = spark.createDataFrame(
        [(10.2, 20.2), (11.0, 19.9), (50.0, 50.0)],
        "out_lat double, out_lon double")
    out = gaussian_interp_to(pts, targets, wlat=3.0, wlon=4.0,
                             slat=1.0, slon=2.0, stime_days=30.0)
    got = {(r.out_lat, r.out_lon): r for r in out.collect()}

    rows = [tuple(r) + (r.time.timestamp(),) for r in pts.collect()]
    for tl, tn in [(10.2, 20.2), (11.0, 19.9)]:
        mean, wsum, n = _brute(rows, tl, tn, 3.0, 4.0, 1.0, 2.0, 30.0)
        r = got[(tl, tn)]
        assert r.gi_mean == pytest.approx(mean, rel=1e-12)
        assert r.gi_wsum == pytest.approx(wsum, rel=1e-12)
        assert r.gi_n == n
    # zero-neighbor target is ABSENT (reference masks weight==0 cells)
    assert (50.0, 50.0) not in got


def test_offgrid_no_time_term(spark, pts):
    targets = spark.createDataFrame([(10.2, 20.2)],
                                    "out_lat double, out_lon double")
    out = gaussian_interp_to(pts, targets, wlat=3.0, wlon=4.0,
                             slat=1.0, slon=2.0).collect()
    rows = [tuple(r) + (0.0,) for r in pts.collect()]
    mean, wsum, n = _brute(rows, 10.2, 20.2, 3.0, 4.0, 1.0, 2.0, None)
    assert out[0].gi_mean == pytest.approx(mean, rel=1e-12)
    assert out[0].gi_n == n


def test_offgrid_window_cutoff_excludes_far_points(spark, pts):
    # wlat=3 -> half-window 1.5: the lat-14.9 point is outside for a
    # 10.2 target; widen to wlat=12 and it enters.
    targets = spark.createDataFrame([(10.2, 20.2)],
                                    "out_lat double, out_lon double")
    narrow = gaussian_interp_to(pts, targets, wlat=3.0, wlon=4.0).collect()
    wide = gaussian_interp_to(pts, targets, wlat=12.0, wlon=4.0).collect()
    assert wide[0].gi_n == narrow[0].gi_n + 1


def test_offgrid_rejects_bad_window(spark, pts):
    targets = spark.createDataFrame([(0.0, 0.0)],
                                    "out_lat double, out_lon double")
    with pytest.raises(ValueError, match="must be positive"):
        gaussian_interp_to(pts, targets, wlat=0.0, wlon=1.0)


def test_offgrid_plan_broadcasts_targets(spark, pts):
    targets = spark.createDataFrame([(10.2, 20.2)],
                                    "out_lat double, out_lon double")
    plan = gaussian_interp_to(
        pts, targets, wlat=3.0, wlon=4.0)._jdf.queryExecution() \
        .executedPlan().toString()
    # The points-targets join is a broadcast hash join on the cell key;
    # the only nested-loop is the 1-row mid-time scalar broadcast.
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
