"""Two-dataset correlation maps (reference /corrMapSpark, /correlationMap).

Per-pixel (or per-resolution-cell) Pearson correlation of two time-aligned
datasets. The reference hand-rolls the one-pass sufficient statistics
Σx,Σy,Σxx,Σyy,Σxy,n per pixel (reference:
algorithms_spark/CorrMapSpark.py:29-151, r formula :263-271); Spark's `corr`
aggregate computes the same formula with a stabler parallel merge.

Join strategy at scale: equi-join on (time, cell) — both sides shuffle on the
same key once and the join is co-partitioned with the following groupBy (one
shuffle total thanks to Catalyst reusing the exchange). No broadcast: both
sides are fact-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import bbox_filter


def corr_map(obs: DataFrame, dataset_x: str, dataset_y: str,
             min_lat: float = -90, max_lat: float = 90,
             min_lon: float = -180, max_lon: float = 180,
             start_time=None, end_time=None,
             resolution: float | None = None) -> DataFrame:
    """Per-pixel Pearson correlation map.

    resolution=None → native grid join on exact (time, lat, lon)
    (/corrMapSpark). resolution=R → bin lat/lon to an R-degree grid and
    average within (time, cell) before correlating (/correlationMap's
    user-resolution sampling, reference: algorithms/CorrelationMap.py:67-115
    — we use the cell mean rather than nearest-point sampling; same
    asymptotic semantics, strictly better estimator).

    Output: lat, lon, corr_r, corr_cnt.
    """
    df = obs.where(bbox_filter(F.col("lat"), F.col("lon"),
                               min_lat, max_lat, min_lon, max_lon))
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))

    if resolution is not None:
        df = df.withColumn(
            "lat", F.floor(F.col("lat") / resolution) * resolution
        ).withColumn(
            "lon", F.floor(F.col("lon") / resolution) * resolution
        )
        # Collapse to one sample per (dataset, time, cell) pre-join.
        df = df.groupBy("dataset", "time", "lat", "lon").agg(
            F.avg("value").alias("value"))

    x = df.where(F.col("dataset") == dataset_x).select(
        "time", "lat", "lon", F.col("value").alias("x"))
    y = df.where(F.col("dataset") == dataset_y).select(
        "time", "lat", "lon", F.col("value").alias("y"))
    joined = x.join(y, ["time", "lat", "lon"])
    return joined.groupBy("lat", "lon").agg(
        F.corr("x", "y").alias("corr_r"),
        F.count(F.when(F.col("x").isNotNull() & F.col("y").isNotNull(), 1))
         .alias("corr_cnt"),
    )
