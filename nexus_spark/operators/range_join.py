"""Keyed interval operators: binned range join and interval union.

The reference's only range predicates are the tile-service bbox/time
window scans (SURVEY §2.2; data-access NexusTileService.find_tiles_* —
see operators/tile_service.py) and the matchup tolerance search
(matchup.py). This module generalizes the same time-interval semantics
to arbitrary keyed interval tables: attribute a point event to every
enclosing interval (range_join), and merge a key's overlapping
intervals into coverage islands (interval_union) — the two primitives
behind session attribution, maintenance-window joins, validity-period
dimensions and on-time coverage reports.

Scale design:

* range_join — the naive formulation is a key-equi join with a range
  predicate, which Spark executes as a join on the key alone followed
  by a per-key filter: every (point, interval) pair of one key is
  materialized before the range test — O(points x intervals-per-key)
  blow-up, the same reason asof.py avoids a range join. Instead, each
  interval is exploded to the fixed-width TIME BINS it covers and each
  point is mapped to its one bin: the join becomes a plain equi-join on
  (key, bin) — hash-partitioned, AQE-skew-splittable, no sort — and
  the exact range test runs as a post-filter on pairs that already
  share a bin. A matched pair shares exactly the point's own bin, so
  no dedup pass is needed. Bin width trades interval fan-out
  (len/bin_seconds explode rows per interval) against candidate
  density per bin; at 100 TB pick it near the median interval length,
  exactly like the matchup cell size.

* interval_union — the classic island merge: one window pass ordered
  by (start, end) per key carries the running max end; an interval
  whose start exceeds the prior running max opens a new island, and a
  running sum of those break flags numbers the islands (the same
  lag/flag/sum shape as sessionize, sql_surface.py). ONE shuffle on
  the key, cost bounded by each key's interval count.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               key_cols: list[str], point_ts: str = "ts",
               start_col: str = "start", end_col: str = "end",
               bin_seconds: int = 3600) -> DataFrame:
    """INNER-join every point to each interval of the same key whose
    [start_col, end_col] (inclusive both ends) contains its timestamp.

    Output: all point columns + all interval columns (keys once).
    Non-key column names must be disjoint between the two sides.
    """
    clash = (set(points.columns) & set(intervals.columns)) \
        - set(key_cols)
    if clash:
        raise ValueError(
            f"non-key columns {sorted(clash)} exist on both sides — "
            "rename before joining")

    def to_bin(c):
        return F.floor(F.unix_timestamp(F.col(c))
                       / F.lit(int(bin_seconds))).cast("long")

    p = points.withColumn("_bin", to_bin(point_ts))
    iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(to_bin(start_col),
                                     to_bin(end_col))))
    return (p.join(iv, [*key_cols, "_bin"])
            .where((F.col(point_ts) >= F.col(start_col))
                   & (F.col(point_ts) <= F.col(end_col)))
            .drop("_bin"))


def interval_union(intervals: DataFrame, key_cols: list[str],
                   start_col: str = "start", end_col: str = "end") \
        -> DataFrame:
    """Merge each key's overlapping-or-touching intervals into islands.

    Output: key cols + island (1-based per key, in time order),
    island_start, island_end, n_intervals.
    """
    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_max.isNull()
                 | (F.col(start_col) > prev_max), 1).otherwise(0)
    run = (intervals
           .withColumn("_brk", brk)
           .withColumn("island", F.sum("_brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (run.groupBy(*key_cols, "island")
            .agg(F.min(start_col).alias("island_start"),
                 F.max(end_col).alias("island_end"),
                 F.count(F.lit(1)).alias("n_intervals")))
