"""Satellite-to-in-situ matchup: geodesic radius + time-tolerance join
(reference /match_spark).

Reference semantics (analysis/webservice/algorithms_spark/Matchup.py:41-691):
for each primary point, find secondary points within ``radius_km`` and
``time_tolerance_s``; ``match_once`` keeps only the nearest secondary per
primary. The reference builds a cKDTree per partition in an
azimuthal-equidistant projection (:584-636) — an index-per-task pattern that
does not scale and re-queries stores from every executor.

Spark-first design (SURVEY §7.6): pure relational bucketed join —
1. bucket both sides into (lat_cell, lon_cell, time_bucket) cells sized by
   the tolerances;
2. explode the PRIMARY side over its neighbor cells: ±1 lat cell, ±1 time
   bucket, and a latitude-dependent lon span (lon degrees shrink by
   cos(lat) — the pole-cap correction), with modular lon wrap at the
   antimeridian;
3. equi-join on the cell key — a plain shuffled hash join Catalyst can
   plan, skew-handled by AQE;
4. post-filter exact haversine distance + time delta;
5. match-once via row_number over (distance, id) per primary.

Everything is JVM-side column math — no UDF, no per-partition index.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nexus_spark.functions.geo import haversine_km

KM_PER_DEG_LAT = 111.195  # mean earth: pi * 6371 / 180


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame (optimized logical plan stats)
    — a planning-time number, no job is run. -1 when unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return -1


def _broadcast_budget_bytes(spark) -> int:
    """Byte budget under which the matchup secondary is broadcast instead
    of shuffled (NEXUS_SPARK_MATCHUP_BROADCAST_MB, default 64 MB). The
    default is a per-executor hash-table budget safe on any executor with
    >= 1 GB of memory; at fact-scale the secondary's estimate exceeds any
    sane budget and the shuffled-hash path is taken, so the setting only
    ever toggles *small* secondaries and needs no cluster-specific tune."""
    import os

    try:
        mb = float(os.environ.get("NEXUS_SPARK_MATCHUP_BROADCAST_MB", "64"))
    except ValueError:
        mb = 64.0
    return int(mb * (1 << 20))


def _bucketed(df: DataFrame, cell_deg: float, lon_cell_deg: float,
              time_tolerance_s: float, n_lon_cells: int) -> DataFrame:
    return (
        df.withColumn("lat_cell", F.floor(F.col("lat") / cell_deg).cast("long"))
        .withColumn("lon_cell",
                    F.pmod(F.floor(F.col("lon") / lon_cell_deg),
                           n_lon_cells).cast("long"))
        .withColumn("time_bucket",
                    F.floor(F.unix_timestamp("time") / F.lit(time_tolerance_s))
                    .cast("long"))
    )


def matchup(
    primary: DataFrame,
    secondary: DataFrame,
    radius_km: float = 1.0,
    time_tolerance_s: float = 86400.0,
    match_once: bool = False,
    cell_deg: float | None = None,
) -> DataFrame:
    """Radius/time matchup join.

    primary:   (primary_id, time, lat, lon, value)
    secondary: (secondary_id, time, lat, lon, value)
    Defaults mirror the reference's (rt=1000 m, tt=86400 s, Matchup.py:173-174).

    Output: primary_id, p_time, p_lat, p_lon, p_value, secondary_id, s_time,
    s_lat, s_lon, s_value, dist_km, dt_s.
    """
    from nexus_spark.functions.validation import validate_tolerances

    validate_tolerances(radius_km, time_tolerance_s)
    radius_deg = radius_km / KM_PER_DEG_LAT
    if cell_deg is None:
        # One cell >= radius → ±1 neighbor span suffices in latitude.
        cell_deg = max(radius_deg, 0.005)
    # The lon ring must divide 360 EXACTLY or cell adjacency breaks at the
    # antimeridian seam: pick the integer cell count first (floor keeps each
    # cell >= cell_deg wide), then derive the width.
    n_lon_cells = max(int(math.floor(360.0 / cell_deg)), 1)
    lon_cell_deg = 360.0 / n_lon_cells
    lat_span = int(math.ceil(radius_deg / cell_deg))  # usually 1

    p = _bucketed(
        primary.select(
            F.col("primary_id"), F.col("time").alias("p_time"),
            F.col("lat"), F.col("lon"), F.col("value").alias("p_value"),
        ).withColumn("time", F.col("p_time")),
        cell_deg, lon_cell_deg, time_tolerance_s, n_lon_cells,
    )
    s = _bucketed(
        secondary.select("secondary_id", "time", "lat", "lon", "value"),
        cell_deg, lon_cell_deg, time_tolerance_s, n_lon_cells,
    ).select(F.col("secondary_id"), F.col("time").alias("s_time"),
             F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon"),
             F.col("value").alias("s_value"),
             F.col("lat_cell").alias("s_lat_cell"),
             F.col("lon_cell").alias("s_lon_cell"),
             F.col("time_bucket").alias("s_time_bucket"))

    # Latitude-dependent longitudinal neighbor span (pole-cap correction):
    # a fixed-degree cell narrows in km by cos(lat), so the radius covers
    # more lon cells at high latitude. Bounded by half the ring.
    lon_span = F.least(
        F.lit(n_lon_cells // 2),
        F.ceil(F.lit(radius_deg) /
               (F.lit(lon_cell_deg) *
                F.greatest(F.cos(F.radians(F.col("lat"))), F.lit(1e-3))))
        .cast("long"),
    )
    p = (
        p.withColumn("dlat", F.explode(F.sequence(F.lit(-lat_span), F.lit(lat_span))))
        .withColumn("dlon", F.explode(F.sequence(-lon_span, lon_span)))
        .withColumn("dtb", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("j_lat_cell", F.col("lat_cell") + F.col("dlat"))
        .withColumn("j_lon_cell", F.pmod(F.col("lon_cell") + F.col("dlon"), n_lon_cells))
        .withColumn("j_time_bucket", F.col("time_bucket") + F.col("dtb"))
    )

    # Join strategy, chosen from the secondary side's optimizer size
    # estimate (no extra job): a compact secondary that fits the broadcast
    # budget is broadcast — the ~45x-exploded primary then never shuffles
    # at all (the dominant cost of this query: the exploded exchange is
    # ~50x the secondary's bytes). A secondary above the budget takes the
    # shuffled hash join on the cell key — the plan that survives both
    # sides growing 100x. Never leave it to Catalyst unhinted: it sizes
    # the primary by its pre-explode scan and would happily BROADCAST the
    # exploded primary — a multi-hundred-MB build.
    s_est = _plan_size_bytes(s)
    if 0 <= s_est <= _broadcast_budget_bytes(secondary.sparkSession):
        s = F.broadcast(s)
    else:
        s = s.hint("shuffle_hash")
    joined = p.join(
        s,
        (F.col("j_lat_cell") == F.col("s_lat_cell"))
        & (F.col("j_lon_cell") == F.col("s_lon_cell"))
        & (F.col("j_time_bucket") == F.col("s_time_bucket")),
    )

    dist = haversine_km(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon"))
    dt = F.abs(F.unix_timestamp("p_time") - F.unix_timestamp("s_time"))
    # Duplicate-freedom without a dedup shuffle: for a given (p, s) pair,
    # dlat and dtb are uniquely determined by the cell difference, and dlon
    # is unique too EXCEPT when the lon neighbor span wraps the whole ring
    # (pole caps), where two offsets can hit the same cell modulo n. Keeping
    # only the canonical centered offset makes every pair appear exactly
    # once — a cheap filter instead of a full exchange on the pair key.
    n_half = n_lon_cells // 2
    canonical_dlon = (
        F.pmod(F.col("s_lon_cell") - F.col("lon_cell") + F.lit(n_half),
               F.lit(n_lon_cells)) - F.lit(n_half))
    out = (
        joined.where(F.col("dlon") == canonical_dlon)
        .withColumn("dist_km", dist)
        .withColumn("dt_s", dt.cast("long"))
        .where((F.col("dist_km") <= radius_km) & (F.col("dt_s") <= time_tolerance_s))
        .select("primary_id", "p_time", F.col("lat").alias("p_lat"),
                F.col("lon").alias("p_lon"), "p_value",
                "secondary_id", "s_time", "s_lat", "s_lon", "s_value",
                "dist_km", "dt_s")
    )

    if match_once:
        # Nearest secondary per primary; deterministic tie-break on rounded
        # distance then id (reference keeps min geodesic distance,
        # Matchup.py:460-473).
        w = Window.partitionBy("primary_id").orderBy(
            F.round(F.col("dist_km"), 6).asc(), F.col("secondary_id").asc())
        out = (out.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1).drop("rn"))
    return out
