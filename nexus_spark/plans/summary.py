"""Summary-table (zone-map) aggregation fast path.

The reference's /statsSolr computes area statistics from tile METADATA alone
for tiles strictly inside the query box, and recomputes only boundary tiles
from raw data (reference: algorithms/TimeSeriesSolr.py:284-329; interior
vs boundary tile queries SolrProxy.pyx:403-451). This is the
aggregate-from-summaries optimization: at 100 TB it turns a full scan into a
scan of a table ~10^4x smaller plus a sliver of raw data.

Our version is EXACT (not the reference's weighted-mean approximation): the
summary table stores the sufficient statistics (Σwv, Σw, Σv, n, min, max) per
tile, so interior contributions combine losslessly; only tiles that the bbox
cuts are recomputed from raw observations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import cos_lat_weight


def build_summary(obs: DataFrame, lat_tile_deg: float = 5.0,
                  lon_tile_deg: float = 30.0) -> DataFrame:
    """Materialize per-(dataset, day, tile) sufficient statistics.

    Tile key = (floor(lat/lat_tile_deg), floor(lon/lon_tile_deg)). In a lake
    deployment this is a written table maintained at ingest (the reference
    computes the same stats in its ingest summarizer,
    nexus-ingest tilesumarizingprocessor.py:27-97).
    """
    w = F.when(F.col("value").isNotNull(), cos_lat_weight("lat"))
    return (
        obs.groupBy(
            "dataset",
            F.to_date("time").alias("tile_date"),
            F.floor(F.col("lat") / lat_tile_deg).alias("lat_tile"),
            F.floor(F.col("lon") / lon_tile_deg).alias("lon_tile"),
        )
        .agg(
            F.min(F.col("lat")).alias("t_min_lat"),
            F.max(F.col("lat")).alias("t_max_lat"),
            F.min(F.col("lon")).alias("t_min_lon"),
            F.max(F.col("lon")).alias("t_max_lon"),
            F.sum(F.col("value") * cos_lat_weight("lat")).alias("t_sum_wv"),
            F.sum(w).alias("t_sum_w"),
            F.sum("value").alias("t_sum_v"),
            F.count("value").alias("t_cnt"),
            F.min("value").alias("t_min"),
            F.max("value").alias("t_max"),
        )
    )


def stats_from_summary(obs: DataFrame, summary: DataFrame, dataset: str,
                       min_lat: float, max_lat: float,
                       min_lon: float, max_lon: float,
                       lat_tile_deg: float = 5.0,
                       lon_tile_deg: float = 30.0,
                       use_native_tiles: bool | None = None) -> DataFrame:
    """Per-day (min, max, weighted mean, count) over a bbox using interior
    tile summaries + boundary recompute. Exact equivalent of running the
    aggregate over the raw observations (the oracle asserts this).

    INVARIANT: any native lat_tile/lon_tile columns on `obs` (a
    tile-partitioned lake carries them as partition columns) must equal
    floor(lat/lat_tile_deg) / floor(lon/lon_tile_deg) for THESE tile-size
    arguments — a lake tiled with a different size would silently drop
    valid observations from both the ring exclusion and the boundary
    semi-join. `use_native_tiles`:
      * None (default): use native columns if present, after validating
        the invariant on a bounded sample (one tiny job; raises on
        mismatch).
      * True: trust native columns with no check (caller owns the
        invariant — the fast path for a lake whose writer is ours,
        sources.lake).
      * False: always derive the tile columns from lat/lon (correct for
        any lake, but the ring predicate no longer partition-prunes).

    Output: dataset, ts_date, ts_min, ts_max, ts_mean, ts_cnt.
    """
    # Both the interior branch and the boundary-key branch consume this
    # subtree. Callers pass a cached/materialized summary
    # (domain.summary_table); re-caching the filtered copy here would
    # accumulate storage blocks per call for no win.
    s = summary.where(F.col("dataset") == dataset)
    interior = s.where(
        (F.col("t_min_lat") >= min_lat) & (F.col("t_max_lat") <= max_lat)
        & (F.col("t_min_lon") >= min_lon) & (F.col("t_max_lon") <= max_lon)
    )
    # Boundary = intersects the box but not strictly within
    # (reference: find_all_boundary_tiles_at_time, SolrProxy.pyx:427-451).
    boundary = s.where(
        (F.col("t_min_lat") <= max_lat) & (F.col("t_max_lat") >= min_lat)
        & (F.col("t_min_lon") <= max_lon) & (F.col("t_max_lon") >= min_lon)
        & ~(
            (F.col("t_min_lat") >= min_lat) & (F.col("t_max_lat") <= max_lat)
            & (F.col("t_min_lon") >= min_lon) & (F.col("t_max_lon") <= max_lon)
        )
    )

    interior_parts = interior.select(
        "dataset", F.col("tile_date").alias("ts_date"),
        "t_sum_wv", "t_sum_w", "t_cnt", "t_min", "t_max")

    # Recompute only the boundary tiles' in-box slivers from raw data. The
    # boundary tile-key set is tiny → broadcast semi-join prunes the scan.
    bkeys = boundary.select("dataset", "tile_date", "lat_tile", "lon_tile")
    o = obs.where(
        (F.col("dataset") == dataset)
        & (F.col("lat") >= min_lat) & (F.col("lat") <= max_lat)
        & (F.col("lon") >= min_lon) & (F.col("lon") <= max_lon)
    )
    # Native tile columns: see the use_native_tiles contract above.
    has_native = "lat_tile" in o.columns and "lon_tile" in o.columns
    if use_native_tiles and not has_native:
        raise ValueError("use_native_tiles=True but obs has no "
                         "lat_tile/lon_tile columns")
    native = has_native if use_native_tiles is None else use_native_tiles
    if native and use_native_tiles is None:
        # Validate the tiling invariant on a bounded sample: a lake tiled
        # with a different size/formula mismatches on essentially every
        # row, so 1000 rows catch it; cost is one single-partition job.
        mism = (o.limit(1000).where(
            (F.col("lat_tile") != F.floor(F.col("lat") / lat_tile_deg))
            | (F.col("lon_tile") != F.floor(F.col("lon") / lon_tile_deg)))
            .count())
        if mism:
            raise ValueError(
                f"native lat_tile/lon_tile columns disagree with "
                f"lat_tile_deg={lat_tile_deg}/lon_tile_deg={lon_tile_deg} "
                f"on {mism} sampled rows; pass use_native_tiles=False to "
                f"derive tiles from lat/lon, or the tile sizes the lake "
                f"was written with")
    if not native:
        o = (o.drop("lat_tile", "lon_tile")
             .withColumn("lat_tile", F.floor(F.col("lat") / lat_tile_deg))
             .withColumn("lon_tile", F.floor(F.col("lon") / lon_tile_deg)))
    # Ring pre-filter, in TILE space: an observation whose grid cell fits
    # wholly inside the bbox can only belong to an interior tile, which
    # the semi-join below would drop anyway — so exclude the interior
    # cell rectangle at the scan. Exact (cell inside bbox ⇒ data extents
    # inside bbox ⇒ the interior classification above), and because the
    # predicate is on the tile columns it becomes PARTITION PRUNING on a
    # lake partitioned by (lat_tile, lon_tile): the boundary recompute
    # never opens interior files — the part of the zone-map win the
    # semi-join alone can't deliver (asserted in test_plans).
    import math
    la0 = math.ceil(min_lat / lat_tile_deg)
    la1 = math.floor(max_lat / lat_tile_deg) - 1
    lo0 = math.ceil(min_lon / lon_tile_deg)
    lo1 = math.floor(max_lon / lon_tile_deg) - 1
    if la0 <= la1 and lo0 <= lo1:
        o = o.where(~((F.col("lat_tile") >= la0) & (F.col("lat_tile") <= la1)
                      & (F.col("lon_tile") >= lo0)
                      & (F.col("lon_tile") <= lo1)))
    o = o.withColumn("tile_date", F.to_date("time"))
    o = o.join(F.broadcast(bkeys), ["dataset", "tile_date", "lat_tile", "lon_tile"],
               "left_semi")
    # Shape each boundary observation as a singleton summary row and fold
    # it into the SAME final aggregation as the interior tiles — one
    # shuffle instead of a boundary pre-aggregation plus a merge.
    w = F.when(F.col("value").isNotNull(), cos_lat_weight("lat"))
    boundary_parts = o.select(
        "dataset", F.col("tile_date").alias("ts_date"),
        (F.col("value") * cos_lat_weight("lat")).alias("t_sum_wv"),
        w.alias("t_sum_w"),
        F.when(F.col("value").isNotNull(), F.lit(1)).otherwise(F.lit(0))
         .cast("bigint").alias("t_cnt"),
        F.col("value").alias("t_min"),
        F.col("value").alias("t_max"),
    )

    return (
        interior_parts.unionByName(boundary_parts)
        .groupBy("dataset", "ts_date")
        .agg(
            F.min("t_min").alias("ts_min"),
            F.max("t_max").alias("ts_max"),
            (F.sum("t_sum_wv") / F.sum("t_sum_w")).alias("ts_mean"),
            F.sum("t_cnt").alias("ts_cnt"),
        )
        .where(F.col("ts_cnt") > 0)
    )


def merge_summaries(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two summary tables into one — the incremental-maintenance
    step: summary(full) == merge(summary(old), summary(delta)).

    Every summary column is a mergeable sufficient statistic (sums add,
    counts add, mins/maxes combine), so an ingest appending one day of
    data updates the zone map by summarizing ONLY the delta and merging —
    never rescanning history. One union + one groupBy on the tile key
    (the same key the summary is already distributed by).
    """
    keys = ["dataset", "tile_date", "lat_tile", "lon_tile"]
    return (a.unionByName(b)
            .groupBy(*keys)
            .agg(F.min("t_min_lat").alias("t_min_lat"),
                 F.max("t_max_lat").alias("t_max_lat"),
                 F.min("t_min_lon").alias("t_min_lon"),
                 F.max("t_max_lon").alias("t_max_lon"),
                 F.sum("t_sum_wv").alias("t_sum_wv"),
                 F.sum("t_sum_w").alias("t_sum_w"),
                 F.sum("t_sum_v").alias("t_sum_v"),
                 F.sum("t_cnt").alias("t_cnt"),
                 F.min("t_min").alias("t_min"),
                 F.max("t_max").alias("t_max")))
