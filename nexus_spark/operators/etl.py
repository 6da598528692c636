"""Ingest/ETL transforms (reference nexus-ingest processor chain, SURVEY §2.4).

Each reference "processor" is a column expression or tiny DataFrame
transform; chains compose with ``DataFrame.transform``. All JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kelvin_to_celsius(value: Column) -> Column:
    """(reference: nexus-xd-python-modules kelvintocelsius.py)"""
    return value - F.lit(273.15)


def wind_dir_speed_to_uv(speed: Column, direction_deg: Column) -> tuple[Column, Column]:
    """u = speed*sin(dir), v = speed*cos(dir)
    (reference: winddirspeedtouv.py)."""
    rad = F.radians(direction_deg)
    return speed * F.sin(rad), speed * F.cos(rad)


def uv_to_speed_dir(u: Column, v: Column) -> tuple[Column, Column]:
    """speed = sqrt(u²+v²); dir = degrees(atan2(−u, −v)) mod 360
    (reference: computespeeddirfromuv.py)."""
    speed = F.sqrt(u * u + v * v)
    direction = F.pmod(F.degrees(F.atan2(-u, -v)), F.lit(360.0))
    return speed, direction


def normalize_longitude(lon: Column) -> Column:
    """lon > 180 → lon − 360 (reference: subtract180longitude.py)."""
    return F.when(lon > 180.0, lon - 360.0).otherwise(lon)


def month_start(time: Column) -> Column:
    """Truncate to first of month (reference:
    normalizetimebeginningofmonth.py)."""
    return F.date_trunc("month", time)


def drop_empty_groups(df: DataFrame, group_cols: list[str],
                      value_col: str = "value") -> DataFrame:
    """Empty-tile filter: drop groups with zero non-NULL cells
    (reference: emptytilefilter.py:16-29)."""
    keys = (df.groupBy(*group_cols).agg(F.count(value_col).alias("_n"))
            .where(F.col("_n") > 0).drop("_n"))
    return df.join(F.broadcast(keys), group_cols, "left_semi")


def regrid(obs: DataFrame, lat_res: float = 1.0, lon_res: float = 1.0) -> DataFrame:
    """Regrid to a regular grid by bin-averaging (reference: regrid1x1.py
    uses scipy interpolation; bin-average is the scalable relational
    equivalent). Output cell centers."""
    return (
        obs.withColumn("g_lat", (F.floor(F.col("lat") / lat_res) + 0.5) * lat_res)
        .withColumn("g_lon", (F.floor(F.col("lon") / lon_res) + 0.5) * lon_res)
        .groupBy("dataset", "time", "g_lat", "g_lon")
        .agg(F.avg("value").alias("value"), F.count("value").alias("cnt"))
    )
