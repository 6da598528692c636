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
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return q_s1_time_series(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
