"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (S1 time-series area stats) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
each a callable (spark, sf_dir) -> DataFrame built from the nexus_spark
library API.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL for each query, sharing
the exact domain-adapter SQL text with the Spark side (nexus_spark.domain),
so the hash compare tests operator semantics, not adapter drift.

Hash-match discipline: every floating column is rounded to 6 decimals and
NaN-normalized to NULL on BOTH sides; every aggregate is aliased identically
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, DoubleType, FloatType, TimestampType

from nexus_spark import domain
from nexus_spark.session import tune

ND = 6  # rounding digits for float hash stability


def _finish(df: DataFrame, nd: int = ND) -> DataFrame:
    """Normalize the hashed surface: round float columns, NaN → NULL (Spark
    returns NaN where DuckDB returns NULL for undefined corr/stddev), and
    render date/timestamp columns as canonical strings (engines disagree on
    date object rendering, strings are unambiguous)."""
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (DoubleType, FloatType)):
            df = df.withColumn(
                f.name,
                F.when(F.isnan(c), F.lit(None)).otherwise(F.round(c, nd)),
            )
        elif isinstance(f.dataType, DateType):
            df = df.withColumn(f.name, F.date_format(c, "yyyy-MM-dd"))
        elif isinstance(f.dataType, TimestampType):
            df = df.withColumn(f.name, F.date_format(c, "yyyy-MM-dd HH:mm:ss"))
    return df


def _with(*ctes: str) -> str:
    return "WITH " + ", ".join(ctes)


OBS = domain.cte(domain.OBSERVATIONS_SQL, "obs")
CLIM = domain.cte(domain.CLIMATOLOGY_SQL, "clim")
MP = domain.cte(domain.MATCHUP_PRIMARY_SQL, "mp")
MS = domain.cte(domain.MATCHUP_SECONDARY_SQL, "ms")

# Shared oracle fragment: cos-lat weighted mean over non-null values.
WMEAN = ("SUM(value * COS(RADIANS(lat))) / "
         "SUM(CASE WHEN value IS NOT NULL THEN COS(RADIANS(lat)) END)")


# --------------------------------------------------------------------------
# S1 — time-series area statistics
# --------------------------------------------------------------------------

def q_s1_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    out = time_series(obs, datasets=["sst_a", "sst_b"],
                      min_lat=-25, max_lat=25, min_lon=-160, max_lon=160,
                      start_time="1994-01-01", end_time="1996-12-31 23:59:59")
    return _finish(out)


SQL_S1 = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS ts_date,
       ROUND(MIN(value), {ND}) AS ts_min,
       ROUND(MAX(value), {ND}) AS ts_max,
       ROUND({WMEAN}, {ND}) AS ts_mean,
       COUNT(value) AS ts_cnt,
       ROUND(STDDEV_POP(value), {ND}) AS ts_std
FROM obs
WHERE lat BETWEEN -25 AND 25 AND lon BETWEEN -160 AND 160
  AND time >= TIMESTAMP '1994-01-01'
  AND time <= TIMESTAMP '1996-12-31 23:59:59'
GROUP BY dataset, strftime(time, '%Y-%m-%d')
"""


def q_s1_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.timeseries import time_series_compare

    obs = domain.observations(spark, sf_dir)
    return _finish(time_series_compare(obs, "sst_a", "sst_b"))


SQL_S1_COMPARE = _with(OBS) + f"""
, ts AS (
  SELECT dataset, CAST(time AS DATE) AS ts_date, {WMEAN} AS ts_mean
  FROM obs GROUP BY dataset, CAST(time AS DATE)
)
SELECT ROUND(REGR_SLOPE(y.ts_mean, x.ts_mean), {ND}) AS cmp_slope,
       ROUND(REGR_INTERCEPT(y.ts_mean, x.ts_mean), {ND}) AS cmp_intercept,
       ROUND(CORR(x.ts_mean, y.ts_mean), {ND}) AS cmp_r,
       COUNT(*) AS cmp_n
FROM ts x JOIN ts y ON x.ts_date = y.ts_date
WHERE x.dataset = 'sst_a' AND y.dataset = 'sst_b'
"""


# --------------------------------------------------------------------------
# S2/S3/A5 — map family
# --------------------------------------------------------------------------

def q_s2_time_avg_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.maps import time_avg_map

    obs = domain.observations(spark, sf_dir)
    return _finish(time_avg_map(obs, dataset="sst_a"))


SQL_S2 = _with(OBS) + f"""
SELECT lat, lon, ROUND(AVG(value), {ND}) AS map_mean,
       COUNT(value) AS map_cnt
FROM obs WHERE dataset = 'sst_a'
GROUP BY lat, lon
"""


def q_s3_clim_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.maps import clim_map

    obs = domain.observations(spark, sf_dir)
    return _finish(clim_map(obs, month=3, dataset="sst_a",
                            start_year=1993, end_year=1997))


SQL_S3 = _with(OBS) + f"""
SELECT lat, lon, ROUND(AVG(value), {ND}) AS clim_mean,
       COUNT(value) AS clim_cnt
FROM obs
WHERE dataset = 'sst_a' AND MONTH(time) = 3
  AND YEAR(time) BETWEEN 1993 AND 1997
GROUP BY lat, lon
"""


def q_a5_lonlat_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.maps import lonlat_map

    obs = domain.observations(spark, sf_dir)
    return _finish(lonlat_map(obs, dataset="sst_b"))


SQL_A5 = _with(OBS) + f"""
SELECT lat, lon,
       ROUND(REGR_SLOPE(value, t_day), {ND}) AS ll_slope,
       ROUND(REGR_INTERCEPT(value, t_day), {ND}) AS ll_intercept,
       ROUND(CORR(t_day, value), {ND}) AS ll_r,
       ROUND(AVG(value), {ND}) AS ll_mean,
       ROUND(MAX(value), {ND}) AS ll_max,
       ROUND(MIN(value), {ND}) AS ll_min,
       ROUND(STDDEV_POP(value), {ND}) AS ll_std,
       COUNT(value) AS ll_cnt
FROM (SELECT lat, lon, value, CAST(epoch(time) AS DOUBLE) / 86400.0 AS t_day
      FROM obs WHERE dataset = 'sst_b') o
GROUP BY lat, lon
"""


# --------------------------------------------------------------------------
# S5/S6 — Hovmöller
# --------------------------------------------------------------------------

def q_s5_hofmoeller_lat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.hofmoeller import hofmoeller

    obs = domain.observations(spark, sf_dir)
    return _finish(hofmoeller(obs, axis="lat", dataset="sst_a"))


def q_s6_hofmoeller_lon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.hofmoeller import hofmoeller

    obs = domain.observations(spark, sf_dir)
    return _finish(hofmoeller(obs, axis="lon", dataset="sst_a"))


def _sql_hof(axis: str) -> str:
    return _with(OBS) + f"""
SELECT strftime(time, '%Y-%m-%d') AS hm_date, {axis},
       COUNT(value) AS hm_cnt,
       ROUND(AVG(value), {ND}) AS hm_avg,
       ROUND(MAX(value), {ND}) AS hm_max,
       ROUND(MIN(value), {ND}) AS hm_min,
       ROUND(STDDEV_POP(value), {ND}) AS hm_std
FROM obs WHERE dataset = 'sst_a'
GROUP BY strftime(time, '%Y-%m-%d'), {axis}
"""


# --------------------------------------------------------------------------
# A7/A10 — projection + catalog
# --------------------------------------------------------------------------

def q_a7_data_in_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import data_in_bounds

    obs = domain.observations(spark, sf_dir)
    return _finish(data_in_bounds(obs, dataset="sst_a",
                                  min_lat=-10, max_lat=10,
                                  min_lon=-60, max_lon=60,
                                  start_time="1995-01-01",
                                  end_time="1995-12-31 23:59:59"))


SQL_A7 = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time, lat, lon,
       ROUND(value, {ND}) AS value
FROM obs
WHERE dataset = 'sst_a' AND value IS NOT NULL
  AND lat BETWEEN -10 AND 10 AND lon BETWEEN -60 AND 60
  AND time >= TIMESTAMP '1995-01-01' AND time <= TIMESTAMP '1995-12-31 23:59:59'
"""


def q_a10_dataset_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import dataset_list

    obs = domain.observations(spark, sf_dir)
    return _finish(dataset_list(obs))


SQL_A10 = _with(OBS) + """
SELECT dataset, COUNT(value) AS obs_cnt,
       strftime(MIN(time), '%Y-%m-%d %H:%M:%S') AS min_time,
       strftime(MAX(time), '%Y-%m-%d %H:%M:%S') AS max_time
FROM obs GROUP BY dataset
"""


# --------------------------------------------------------------------------
# S4/A4 — correlation maps
# --------------------------------------------------------------------------

def q_s4_corr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.correlation import corr_map

    obs = domain.observations(spark, sf_dir)
    return _finish(corr_map(obs, "sst_a", "sst_b"))


SQL_S4 = _with(OBS) + f"""
SELECT x.lat AS lat, x.lon AS lon,
       ROUND(CORR(x.value, y.value), {ND}) AS corr_r,
       COUNT(CASE WHEN x.value IS NOT NULL AND y.value IS NOT NULL
             THEN 1 END) AS corr_cnt
FROM (SELECT time, lat, lon, value FROM obs WHERE dataset = 'sst_a') x
JOIN (SELECT time, lat, lon, value FROM obs WHERE dataset = 'sst_b') y
  ON x.time = y.time AND x.lat = y.lat AND x.lon = y.lon
GROUP BY x.lat, x.lon
"""


def q_a4_corr_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.correlation import corr_map

    obs = domain.observations(spark, sf_dir)
    return _finish(corr_map(obs, "sst_a", "sst_b", resolution=30.0))


SQL_A4 = _with(OBS) + f"""
, g AS (
  SELECT dataset, time,
         FLOOR(lat / 30.0) * 30.0 AS lat, FLOOR(lon / 30.0) * 30.0 AS lon,
         AVG(value) AS value
  FROM obs
  GROUP BY dataset, time, FLOOR(lat / 30.0) * 30.0, FLOOR(lon / 30.0) * 30.0
)
SELECT x.lat AS lat, x.lon AS lon,
       ROUND(CORR(x.value, y.value), {ND}) AS corr_r,
       COUNT(CASE WHEN x.value IS NOT NULL AND y.value IS NOT NULL
             THEN 1 END) AS corr_cnt
FROM (SELECT time, lat, lon, value FROM g WHERE dataset = 'sst_a') x
JOIN (SELECT time, lat, lon, value FROM g WHERE dataset = 'sst_b') y
  ON x.time = y.time AND x.lat = y.lat AND x.lon = y.lon
GROUP BY x.lat, x.lon
"""


# --------------------------------------------------------------------------
# S7 — daily-difference anomaly (as-of climatology join)
# --------------------------------------------------------------------------

def q_s7_daily_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.daily_difference import daily_difference

    obs = domain.observations(spark, sf_dir)
    clim = domain.climatology(spark, sf_dir)
    return _finish(daily_difference(obs, clim, "sst_a", "sst_a_CLIM"))


SQL_S7 = _with(OBS, CLIM) + f"""
, o AS (SELECT time, lat, lon, value, DAYOFYEAR(time) AS doy
        FROM obs WHERE dataset = 'sst_a')
, iv AS (
  SELECT lat, lon, doy AS doy_from,
         COALESCE(LEAD(doy) OVER (PARTITION BY dataset, lat, lon
                                  ORDER BY doy) - 1, 366) AS doy_to,
         value AS clim_value
  FROM clim)
SELECT strftime(o.time, '%Y-%m-%d') AS dd_date,
       ROUND(AVG(o.value - iv.clim_value), {ND}) AS dd_mean,
       ROUND(STDDEV_SAMP(o.value - iv.clim_value), {ND}) AS dd_std,
       COUNT(o.value - iv.clim_value) AS dd_cnt
FROM o JOIN iv
  ON o.lat = iv.lat AND o.lon = iv.lon
 AND o.doy BETWEEN iv.doy_from AND iv.doy_to
GROUP BY strftime(o.time, '%Y-%m-%d')
"""


# --------------------------------------------------------------------------
# S8 — matchup (geodesic radius + time-tolerance join)
# --------------------------------------------------------------------------

_MU_R = 300.0      # km
_MU_TT = 86400.0   # s (reference default tolerance)

_HAVERSINE = """2*6371.0*ASIN(SQRT(
    SIN(RADIANS(ms.lat - mp.lat)/2) * SIN(RADIANS(ms.lat - mp.lat)/2)
    + COS(RADIANS(mp.lat)) * COS(RADIANS(ms.lat))
      * SIN(RADIANS(ms.lon - mp.lon)/2) * SIN(RADIANS(ms.lon - mp.lon)/2)))"""


def q_s8_matchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.matchup import matchup

    p = domain.matchup_primary(spark, sf_dir)
    s = domain.matchup_secondary(spark, sf_dir)
    return _finish(matchup(p, s, radius_km=_MU_R, time_tolerance_s=_MU_TT))


def q_s8_matchup_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.matchup import matchup

    p = domain.matchup_primary(spark, sf_dir)
    s = domain.matchup_secondary(spark, sf_dir)
    return _finish(matchup(p, s, radius_km=_MU_R, time_tolerance_s=_MU_TT,
                           match_once=True))


def _sql_matchup(match_once: bool) -> str:
    base = _with(MP, MS) + f"""
, pairs AS (
  SELECT mp.primary_id,
         strftime(mp.time, '%Y-%m-%d %H:%M:%S') AS p_time,
         mp.lat AS p_lat, mp.lon AS p_lon, mp.value AS p_value,
         ms.secondary_id,
         strftime(ms.time, '%Y-%m-%d %H:%M:%S') AS s_time,
         ms.lat AS s_lat, ms.lon AS s_lon, ms.value AS s_value,
         {_HAVERSINE} AS dist_km,
         ABS(CAST(FLOOR(epoch(mp.time)) AS BIGINT)
             - CAST(FLOOR(epoch(ms.time)) AS BIGINT)) AS dt_s
  FROM mp JOIN ms
    ON ABS(CAST(FLOOR(epoch(mp.time)) AS BIGINT)
           - CAST(FLOOR(epoch(ms.time)) AS BIGINT)) <= {_MU_TT:.0f}
 WHERE {_HAVERSINE} <= {_MU_R}
)
SELECT primary_id, p_time, p_lat, p_lon, p_value,
       secondary_id, s_time, s_lat, s_lon, s_value,
       ROUND(dist_km, {ND}) AS dist_km, dt_s
FROM pairs
"""
    if match_once:
        base += """QUALIFY ROW_NUMBER() OVER (
    PARTITION BY primary_id
    ORDER BY ROUND(dist_km, 6) ASC, secondary_id ASC) = 1
"""
    return base


# --------------------------------------------------------------------------
# A2 — summary-table (zone-map) fast path; oracle = direct aggregation,
# proving the interior+boundary recombination is EXACT
# --------------------------------------------------------------------------

def q_a2_stats_from_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.plans.summary import build_summary, stats_from_summary

    obs = domain.observations(spark, sf_dir)
    summary = build_summary(obs, lat_tile_deg=10.0, lon_tile_deg=60.0)
    return _finish(stats_from_summary(
        obs, summary, "sst_a", -25, 25, -160, 160,
        lat_tile_deg=10.0, lon_tile_deg=60.0))


SQL_A2 = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS ts_date,
       ROUND(MIN(value), {ND}) AS ts_min,
       ROUND(MAX(value), {ND}) AS ts_max,
       ROUND({WMEAN}, {ND}) AS ts_mean,
       COUNT(value) AS ts_cnt
FROM obs
WHERE dataset = 'sst_a'
  AND lat BETWEEN -25 AND 25 AND lon BETWEEN -160 AND 160
GROUP BY dataset, strftime(time, '%Y-%m-%d')
HAVING COUNT(value) > 0
"""


# --------------------------------------------------------------------------
# A8 — nearest-value lookup (argmin per day; exercises the equidistant
# tie-break: (5.0, 20.0) is equidistant from lat cells 2.5 and 7.5)
# --------------------------------------------------------------------------

_NV_LAT, _NV_LON = 5.0, 20.0


def q_a8_nearest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import nearest_value

    obs = domain.observations(spark, sf_dir)
    return _finish(nearest_value(obs, "sst_a", _NV_LAT, _NV_LON))


SQL_A8 = _with(OBS) + f"""
, o AS (
  SELECT strftime(time, '%Y-%m-%d') AS nv_date,
         lat AS nv_lat, lon AS nv_lon, value AS nv_value,
         ROUND((lat - {_NV_LAT}) * (lat - {_NV_LAT})
               + (lon - {_NV_LON}) * (lon - {_NV_LON}), 9) AS d2
  FROM obs WHERE dataset = 'sst_a' AND value IS NOT NULL)
SELECT nv_date, nv_lat, nv_lon, ROUND(nv_value, {ND}) AS nv_value
FROM o
QUALIFY ROW_NUMBER() OVER (PARTITION BY nv_date
                           ORDER BY d2, nv_lat, nv_lon, nv_value) = 1
"""


# --------------------------------------------------------------------------
# Tile-service predicate vocabulary (SURVEY §2.2)
# --------------------------------------------------------------------------

TILES = domain.cte(domain.TILES_SQL, "tiles")


def q_t_tiles_in_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import tiles_in_box

    t = domain.tiles(spark, sf_dir)
    return _finish(tiles_in_box(t, -20, 20, -100, 100, dataset="sst_a",
                                start_time="1995-01-01", end_time="1995-06-30"))


SQL_T_TILES = _with(TILES) + f"""
SELECT dataset, strftime(tile_date, '%Y-%m-%d') AS tile_date,
       min_lat, max_lat, min_lon, max_lon,
       ROUND(stats_min, {ND}) AS stats_min,
       ROUND(stats_max, {ND}) AS stats_max,
       ROUND(stats_mean, {ND}) AS stats_mean,
       stats_count
FROM tiles
WHERE dataset = 'sst_a'
  AND min_lat <= 20 AND max_lat >= -20 AND min_lon <= 100 AND max_lon >= -100
  AND tile_date >= DATE '1995-01-01' AND tile_date <= DATE '1995-06-30'
"""


def q_t_days_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import days_in_range

    obs = domain.observations(spark, sf_dir)
    return _finish(days_in_range(obs, "sst_b", "1996-03-01",
                                 "1996-09-30 23:59:59"))


SQL_T_DAYS = _with(OBS) + """
SELECT DISTINCT strftime(time, '%Y-%m-%d') AS day
FROM obs
WHERE dataset = 'sst_b'
  AND time >= TIMESTAMP '1996-03-01' AND time <= TIMESTAMP '1996-09-30 23:59:59'
"""


def q_t_asof_doy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import asof_day_of_year

    clim = domain.climatology(spark, sf_dir)
    return _finish(asof_day_of_year(clim, 200))


SQL_T_ASOF = _with(CLIM) + f"""
SELECT dataset, lat, lon, MAX(doy) AS asof_doy,
       ROUND(ARG_MAX(value, doy), {ND}) AS asof_value
FROM clim WHERE doy <= 200
GROUP BY dataset, lat, lon
"""


def q_t_distinct_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import distinct_bounding_boxes

    t = domain.tiles(spark, sf_dir)
    return _finish(distinct_bounding_boxes(t))


SQL_T_BBOXES = _with(TILES) + """
SELECT DISTINCT min_lat, max_lat, min_lon, max_lon FROM tiles
"""


# --------------------------------------------------------------------------
# Filters — seasonal-cycle removal as a window function
# --------------------------------------------------------------------------

def q_f_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.functions.filtering import seasonal_cycle_filter
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    ts = time_series(obs, datasets=["sst_a"]).select("ts_date", "ts_mean")
    return _finish(seasonal_cycle_filter(ts, "ts_mean", "ts_date"))


SQL_F_SEASONAL = _with(OBS) + f"""
, ts AS (
  SELECT CAST(time AS DATE) AS d, {WMEAN} AS ts_mean
  FROM obs WHERE dataset = 'sst_a'
  GROUP BY CAST(time AS DATE)
)
SELECT strftime(d, '%Y-%m-%d') AS ts_date,
       ROUND(ts_mean, {ND}) AS ts_mean,
       ROUND(ts_mean - AVG(ts_mean) OVER (PARTITION BY MONTH(d)), {ND})
         AS deseasoned
FROM ts
"""


# --------------------------------------------------------------------------
# ETL transforms (SURVEY §2.4) — unit conversions + regrid
# --------------------------------------------------------------------------

def q_etl_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.etl import (
        kelvin_to_celsius, month_start, normalize_longitude,
        uv_to_speed_dir, wind_dir_speed_to_uv)

    ev = load_table(spark, sf_dir, "events")
    direction = (F.col("event_id") % 360).cast("double")
    u, v = wind_dir_speed_to_uv(F.col("value"), direction)
    ev = ev.withColumn("wind_u", u).withColumn("wind_v", v)
    speed2, dir2 = uv_to_speed_dir(F.col("wind_u"), F.col("wind_v"))
    lon0 = (F.col("event_id") % 400).cast("double")
    out = ev.select(
        "event_id",
        kelvin_to_celsius(F.col("value")).alias("celsius"),
        F.col("wind_u").alias("wind_u"),
        F.col("wind_v").alias("wind_v"),
        speed2.alias("speed_rt"),
        dir2.alias("dir_rt"),
        normalize_longitude(lon0).alias("lon_norm"),
        month_start(F.col("ts")).alias("month_start"),
    )
    return _finish(out)


SQL_ETL = f"""
WITH ev AS (
  SELECT event_id, ts, value,
         value * SIN(RADIANS(CAST(event_id % 360 AS DOUBLE))) AS wind_u,
         value * COS(RADIANS(CAST(event_id % 360 AS DOUBLE))) AS wind_v,
         CAST(event_id % 400 AS DOUBLE) AS lon0
  FROM events)
SELECT event_id,
       ROUND(value - 273.15, {ND}) AS celsius,
       ROUND(wind_u, {ND}) AS wind_u,
       ROUND(wind_v, {ND}) AS wind_v,
       ROUND(SQRT(wind_u * wind_u + wind_v * wind_v), {ND}) AS speed_rt,
       ROUND(FMOD(FMOD(DEGREES(ATAN2(-wind_u, -wind_v)), 360.0) + 360.0,
                  360.0), {ND}) AS dir_rt,
       ROUND(CASE WHEN lon0 > 180 THEN lon0 - 360.0 ELSE lon0 END, {ND})
         AS lon_norm,
       strftime(DATE_TRUNC('month', ts), '%Y-%m-%d %H:%M:%S') AS month_start
FROM ev
"""


def q_etl_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.etl import regrid

    obs = domain.observations(spark, sf_dir)
    return _finish(regrid(obs, lat_res=10.0, lon_res=60.0))


SQL_REGRID = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d %H:%M:%S') AS time,
       (FLOOR(lat / 10.0) + 0.5) * 10.0 AS g_lat,
       (FLOOR(lon / 60.0) + 0.5) * 60.0 AS g_lon,
       ROUND(AVG(value), {ND}) AS value,
       COUNT(value) AS cnt
FROM obs
GROUP BY dataset, strftime(time, '%Y-%m-%d %H:%M:%S'),
         (FLOOR(lat / 10.0) + 0.5) * 10.0, (FLOOR(lon / 60.0) + 0.5) * 60.0
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "s1_time_series": q_s1_time_series,
    "s1_time_series_compare": q_s1_compare,
    "s2_time_avg_map": q_s2_time_avg_map,
    "s3_clim_map": q_s3_clim_map,
    "s5_hofmoeller_lat": q_s5_hofmoeller_lat,
    "s6_hofmoeller_lon": q_s6_hofmoeller_lon,
    "a5_lonlat_map": q_a5_lonlat_map,
    "a7_data_in_bounds": q_a7_data_in_bounds,
    "a10_dataset_list": q_a10_dataset_list,
    "s4_corr_map": q_s4_corr_map,
    "a4_corr_grid": q_a4_corr_grid,
    "s7_daily_difference": q_s7_daily_difference,
    "s8_matchup": q_s8_matchup,
    "s8_matchup_once": q_s8_matchup_once,
    "a2_stats_from_summary": q_a2_stats_from_summary,
    "a8_nearest_value": q_a8_nearest_value,
    "t_tiles_in_box": q_t_tiles_in_box,
    "t_days_in_range": q_t_days_in_range,
    "t_asof_doy": q_t_asof_doy,
    "t_distinct_bboxes": q_t_distinct_bboxes,
    "f_seasonal_filter": q_f_seasonal,
    "etl_transforms": q_etl_transforms,
    "etl_regrid": q_etl_regrid,
}

_ORACLES: dict[str, str] = {
    "s1_time_series": SQL_S1,
    "s1_time_series_compare": SQL_S1_COMPARE,
    "s2_time_avg_map": SQL_S2,
    "s3_clim_map": SQL_S3,
    "s5_hofmoeller_lat": _sql_hof("lat"),
    "s6_hofmoeller_lon": _sql_hof("lon"),
    "a5_lonlat_map": SQL_A5,
    "a7_data_in_bounds": SQL_A7,
    "a10_dataset_list": SQL_A10,
    "s4_corr_map": SQL_S4,
    "a4_corr_grid": SQL_A4,
    "s7_daily_difference": SQL_S7,
    "s8_matchup": _sql_matchup(False),
    "s8_matchup_once": _sql_matchup(True),
    "a2_stats_from_summary": SQL_A2,
    "a8_nearest_value": SQL_A8,
    "t_tiles_in_box": SQL_T_TILES,
    "t_days_in_range": SQL_T_DAYS,
    "t_asof_doy": SQL_T_ASOF,
    "t_distinct_bboxes": SQL_T_BBOXES,
    "f_seasonal_filter": SQL_F_SEASONAL,
    "etl_transforms": SQL_ETL,
    "etl_regrid": SQL_REGRID,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return q_s1_time_series(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
