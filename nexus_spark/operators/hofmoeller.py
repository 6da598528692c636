"""Hovmöller diagrams (reference /latitudeTimeHofMoellerSpark,
/longitudeTimeHofMoellerSpark).

Per (time, latitude) or (time, longitude) stats: count, avg, max, min,
population std (reference: algorithms_spark/HofMoellerSpark.py:65-205,
per-axis groupby :86-102). One groupBy; the deseason pass (:110-130) is a
window function in functions.filtering.deseason_by_sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import bbox_filter


def hofmoeller(obs: DataFrame, axis: str = "lat", dataset: str | None = None,
               min_lat: float = -90, max_lat: float = 90,
               min_lon: float = -180, max_lon: float = 180,
               start_time=None, end_time=None) -> DataFrame:
    """axis in {'lat', 'lon'}. Output: hm_date, <axis>, hm_cnt, hm_avg,
    hm_max, hm_min, hm_std."""
    if axis not in ("lat", "lon"):
        raise ValueError("axis must be 'lat' or 'lon'")
    df = obs.where(bbox_filter(F.col("lat"), F.col("lon"),
                               min_lat, max_lat, min_lon, max_lon))
    if dataset is not None:
        df = df.where(F.col("dataset") == dataset)
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    return df.groupBy(F.to_date("time").alias("hm_date"), axis).agg(
        F.count("value").alias("hm_cnt"),
        F.avg("value").alias("hm_avg"),
        F.max("value").alias("hm_max"),
        F.min("value").alias("hm_min"),
        F.stddev_pop("value").alias("hm_std"),
    )
