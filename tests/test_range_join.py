"""Unit tests for the keyed interval operators (operators/range_join)."""
import pytest
from pyspark.sql import functions as F

from nexus_spark.operators.range_join import interval_union, range_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c in df.columns:
        if c.startswith("t_"):
            df = df.withColumn(c[2:], F.timestamp_seconds(F.col(c))) \
                   .drop(c)
    return df


def test_range_join_matches_across_bins(spark):
    """An interval spanning many bins still matches points in every
    covered bin exactly once; points outside all intervals drop."""
    pts = _ts(spark, [(1, 100, 10), (1, 5000, 11), (1, 9000, 12),
                      (2, 100, 20)],
              "k long, t_ts long, pid long")
    iv = _ts(spark, [(1, 50, 8000, 100)],
             "k long, t_start long, t_end long, ivid long")
    out = range_join(pts, iv, ["k"], "ts", "start", "end",
                     bin_seconds=60).select("pid", "ivid").collect()
    got = sorted((r.pid, r.ivid) for r in out)
    # pid 12 is past end=8000; key 2 has no interval
    assert got == [(10, 100), (11, 100)]


def test_range_join_inclusive_bounds_and_overlaps(spark):
    """Both endpoints are inclusive; overlapping intervals each match."""
    pts = _ts(spark, [(1, 100, 1), (1, 200, 2)],
              "k long, t_ts long, pid long")
    iv = _ts(spark, [(1, 100, 200, 10), (1, 150, 250, 11)],
             "k long, t_start long, t_end long, ivid long")
    out = range_join(pts, iv, ["k"], "ts", "start", "end",
                     bin_seconds=3600).select("pid", "ivid").collect()
    got = sorted((r.pid, r.ivid) for r in out)
    assert got == [(1, 10), (2, 10), (2, 11)]


def test_range_join_rejects_column_clash(spark):
    pts = _ts(spark, [(1, 100, 5)], "k long, t_ts long, x long")
    iv = _ts(spark, [(1, 50, 150, 7)],
             "k long, t_start long, t_end long, x long")
    with pytest.raises(ValueError, match="both sides"):
        range_join(pts, iv, ["k"], "ts", "start", "end")


def test_interval_union_islands(spark):
    """Overlapping and touching intervals merge; gaps split islands;
    island numbering is per-key in time order."""
    iv = _ts(spark, [
        (1, 0, 100, 0), (1, 50, 150, 0),     # overlap -> island 1
        (1, 150, 200, 0),                    # touching -> still island 1
        (1, 500, 600, 0),                    # gap -> island 2
        (2, 0, 10, 0),
    ], "k long, t_start long, t_end long, pad long").drop("pad")
    out = interval_union(iv, ["k"], "start", "end")
    rows = {(r.k, r.island):
            (r.island_start.timestamp(), r.island_end.timestamp(),
             r.n_intervals)
            for r in out.collect()}
    assert rows[(1, 1)] == (0, 200, 3)
    assert rows[(1, 2)] == (500, 600, 1)
    assert rows[(2, 1)] == (0, 10, 1)


def test_interval_union_contained_interval(spark):
    """An interval fully inside an earlier one must not reopen the
    island even though its end is smaller than the running max."""
    iv = _ts(spark, [(1, 0, 1000, 0), (1, 10, 20, 0), (1, 900, 2000, 0)],
             "k long, t_start long, t_end long, pad long").drop("pad")
    out = interval_union(iv, ["k"], "start", "end").collect()
    assert len(out) == 1
    assert out[0].n_intervals == 3
    assert out[0].island_end.timestamp() == 2000


def test_canonical_survivors_tiebreak(spark):
    """Canonical pick is (quality DESC, id ASC); n_members counts the
    whole cluster."""
    from nexus_spark.operators.dedup import canonical_survivors

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)],
        "doc_id long, component long")
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 5)],
        "doc_id long, n_chars long")
    out = {r.component: r for r in
           canonical_survivors(comps, docs).collect()}
    assert out[1].canonical_id == 2          # 30 ties -> min doc_id
    assert out[1].canonical_n_chars == 30
    assert out[1].n_members == 3
    assert out[9].canonical_id == 9
