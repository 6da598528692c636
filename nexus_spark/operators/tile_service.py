"""Catalog / subset / lookup operators — the reference's tile-service
predicate vocabulary and light handlers re-expressed as DataFrame queries
(reference: data-access/nexustiles/nexustiles.py + dao/SolrProxy.pyx;
handlers /list, /datainbounds, /standardDeviation, /tiles).

These all compile to pruned scans + filters; at 100 TB every one of them is
served by partition pruning (dataset, date) + parquet row-group stats — the
zone-map role Solr played in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import bbox_filter


def dataset_list(obs: DataFrame) -> DataFrame:
    """Dataset catalog: per-dataset observation count + time extent
    (reference: algorithms/DataSeriesList.py:11-30 — Solr facet counts +
    min/max time; here one aggregate)."""
    return obs.groupBy("dataset").agg(
        F.count("value").alias("obs_cnt"),
        F.min("time").alias("min_time"),
        F.max("time").alias("max_time"),
    )


def doms_dataset_list(obs: DataFrame, events: DataFrame) -> DataFrame:
    """DOMS catalog: gridded datasets UNION insitu event datasets
    (reference: doms/DomsInitialization list surface — the DOMS list spans
    both the gridded lake and the insitu stores, unlike /list which is
    gridded-only). Times render as strings (date-only for the
    midnight-aligned gridded branch) so the surface is engine-stable.

    Output: dataset, obs_cnt, min_time, max_time, kind.
    """
    gridded = (dataset_list(obs)
               .withColumn("min_time", F.date_format("min_time", "yyyy-MM-dd"))
               .withColumn("max_time", F.date_format("max_time", "yyyy-MM-dd"))
               .withColumn("kind", F.lit("gridded")))
    insitu = (events.groupBy(F.col("event_type").alias("dataset"))
              .agg(F.count("value").alias("obs_cnt"),
                   F.date_format(F.min("ts"),
                                 "yyyy-MM-dd HH:mm:ss").alias("min_time"),
                   F.date_format(F.max("ts"),
                                 "yyyy-MM-dd HH:mm:ss").alias("max_time"))
              .withColumn("kind", F.lit("insitu")))
    return gridded.unionByName(insitu)


def data_in_bounds(obs: DataFrame, dataset: str | None = None,
                   min_lat: float = -90, max_lat: float = 90,
                   min_lon: float = -180, max_lon: float = 180,
                   start_time=None, end_time=None) -> DataFrame:
    """Raw point extraction (reference: algorithms/DataInBoundsSearch.py:
    112-147) — a pure filter + projection; masked (NULL) cells excluded as
    the point generator does."""
    df = obs.where(bbox_filter(F.col("lat"), F.col("lon"),
                               min_lat, max_lat, min_lon, max_lon))
    if dataset is not None:
        df = df.where(F.col("dataset") == dataset)
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    return df.where(F.col("value").isNotNull()).select(
        "dataset", "time", "lat", "lon", "value")


def nearest_value(obs: DataFrame, dataset: str, lat: float, lon: float,
                  start_time=None, end_time=None) -> DataFrame:
    """Nearest-point lookup: value at the grid point closest to (lat, lon)
    per day (reference: /standardDeviation nearest-via-cdist,
    algorithms/StandardDeviationSearch.py:155-168; nearest-value sampling
    nexusmodel.py:223-250). argmin as the ``min_by`` aggregate — no sort, no
    driver loop.

    Output: nv_date, nv_lat, nv_lon, nv_value (value of nearest point).
    """
    df = obs.where((F.col("dataset") == dataset) & F.col("value").isNotNull())
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    # Squared euclidean in degrees — monotone with the cdist the reference
    # uses for its nearest lookup; rounded for a deterministic argmin.
    # Squares via multiplication (pow() implementations differ across
    # engines at the ulp level).
    dlat = F.col("lat") - F.lit(lat)
    dlon = F.col("lon") - F.lit(lon)
    d2 = F.round(dlat * dlat + dlon * dlon, 9)
    packed = F.struct(d2.alias("d2"), F.col("lat").alias("nv_lat"),
                      F.col("lon").alias("nv_lon"),
                      F.col("value").alias("nv_value"))
    return (
        df.groupBy(F.to_date("time").alias("nv_date"))
        .agg(F.min(packed).alias("m"))
        .select("nv_date", F.col("m.nv_lat").alias("nv_lat"),
                F.col("m.nv_lon").alias("nv_lon"),
                F.col("m.nv_value").alias("nv_value"))
    )


def tiles_in_box(tiles: DataFrame, min_lat: float, max_lat: float,
                 min_lon: float, max_lon: float,
                 dataset: str | None = None,
                 start_time=None, end_time=None) -> DataFrame:
    """Tile-summary search: bbox intersection + time-interval overlap,
    sorted by time (reference: SolrProxy.pyx:186-217 — the 3-clause
    interval-overlap predicate becomes `min <= qend AND max >= qstart`)."""
    df = tiles.where(
        (F.col("min_lat") <= max_lat) & (F.col("max_lat") >= min_lat)
        & (F.col("min_lon") <= max_lon) & (F.col("max_lon") >= min_lon)
    )
    if dataset is not None:
        df = df.where(F.col("dataset") == dataset)
    if start_time is not None:
        df = df.where(F.col("tile_date") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("tile_date") <= F.lit(end_time))
    return df.orderBy("tile_date", "min_lat", "min_lon")


def distinct_bounding_boxes(tiles: DataFrame) -> DataFrame:
    """Distinct tile bboxes (reference: nexustiles.py:231-241, Solr facet on
    geo_s → a distinct projection)."""
    return tiles.select("min_lat", "max_lat", "min_lon", "max_lon").distinct()


def days_in_range(obs: DataFrame, dataset: str, start_time=None,
                  end_time=None) -> DataFrame:
    """Distinct observation days ascending (reference: nexustiles.py:77-79 /
    SolrProxy.pyx:155-184 — Solr facet; here distinct + sort)."""
    df = obs.where(F.col("dataset") == dataset)
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    return df.select(F.to_date("time").alias("day")).distinct().orderBy("day")


def asof_day_of_year(clim: DataFrame, day_of_year: int) -> DataFrame:
    """Climatology as-of lookup: per pixel, the most recent row with
    doy <= day_of_year (reference:
    find_tile_by_polygon_and_most_recent_day_of_year, SolrProxy.pyx:137-153).
    max_by per group — no sort-limit per key."""
    return (
        clim.where(F.col("doy") <= day_of_year)
        .groupBy("dataset", "lat", "lon")
        .agg(F.max("doy").alias("asof_doy"),
             F.max_by("value", "doy").alias("asof_value"))
    )
