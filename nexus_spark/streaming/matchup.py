"""Streaming satellite-to-insitu matchup: S8's radius/time join as a
watermarked stream-stream join.

Reference: the batch matchup (operators/matchup.py; reference
analysis/webservice/algorithms_spark/Matchup.py) pairs primary and
secondary points within a radius and a time tolerance. When both feeds
are continuous (a granule stream and an in-situ stream), Structured
Streaming's stream-stream inner join expresses the same semantics
natively: equi-join on the spatial cell grid plus an EVENT-TIME RANGE
condition — and it is exactly that range condition, with the watermarks,
that lets Spark evict join state, so each side buffers only
(watermark + tolerance) of history regardless of how long the query runs.

Differences from the batch operator, both forced by streaming semantics:
- no `time_bucket` column — the batch operator equi-joins on a coarse
  time bucket to feed a hash join; the streaming join wants the raw
  interval condition, which doubles as its state-eviction contract;
- no `match_once` — nearest-per-primary is a ranking over all matches of
  a primary, unbounded in append mode; run it as a downstream batch over
  the emitted matches (the kappa split the tests demonstrate).

On static frames this degrades gracefully to a plain bounded join with
identical output to `matchup(match_once=False)` — the parity test.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.streaming import ensure_event_time

from nexus_spark.functions.geo import haversine_km
from nexus_spark.operators.matchup import KM_PER_DEG_LAT


def streaming_matchup(
    primary: DataFrame,
    secondary: DataFrame,
    radius_km: float = 1.0,
    time_tolerance_s: float = 86400.0,
    watermark: str = "1 hour",
    cell_deg: float | None = None,
) -> DataFrame:
    """Watermarked stream-stream radius/time matchup.

    primary:   (primary_id, time, lat, lon, value) — streaming or static
    secondary: (secondary_id, time, lat, lon, value) — streaming or static
    Output: the batch matchup columns (primary_id, p_time, p_lat, p_lon,
    p_value, secondary_id, s_time, s_lat, s_lon, s_value, dist_km, dt_s).

    `watermark` is the lateness bound for BOTH feeds; a row arriving later
    than it can silently miss partners (that is the streaming contract,
    not a defect). Join state per side is bounded by
    watermark + time_tolerance.
    """
    from nexus_spark.functions.validation import validate_tolerances

    validate_tolerances(radius_km, time_tolerance_s)
    radius_deg = radius_km / KM_PER_DEG_LAT
    if cell_deg is None:
        cell_deg = max(radius_deg, 0.005)
    n_lon_cells = max(int(math.floor(360.0 / cell_deg)), 1)
    lon_cell_deg = 360.0 / n_lon_cells
    lat_span = int(math.ceil(radius_deg / cell_deg))

    def cells(df: DataFrame, lat: str, lon: str) -> DataFrame:
        return (df.withColumn(
            "lat_cell", F.floor(F.col(lat) / cell_deg).cast("long"))
            .withColumn("lon_cell",
                        F.pmod(F.floor(F.col(lon) / lon_cell_deg),
                               n_lon_cells).cast("long")))

    p = cells(primary.select(
        "primary_id", F.col("time").alias("p_time"),
        F.col("lat").alias("p_lat"), F.col("lon").alias("p_lon"),
        F.col("value").alias("p_value")), "p_lat", "p_lon")
    s = cells(secondary.select(
        "secondary_id", F.col("time").alias("s_time"),
        F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon"),
        F.col("value").alias("s_value")), "s_lat", "s_lon") \
        .withColumnRenamed("lat_cell", "s_lat_cell") \
        .withColumnRenamed("lon_cell", "s_lon_cell")

    if p.isStreaming:
        p = ensure_event_time(p, "p_time").withWatermark("p_time", watermark)
    if s.isStreaming:
        s = ensure_event_time(s, "s_time").withWatermark("s_time", watermark)
    else:
        # Static (reference-data) secondary: pin the join build side with
        # the SAME size guard as the batch operator (round 14, guide
        # §3.1/§5). Under the broadcast budget the secondary is broadcast
        # — each micro-batch is then a stateless BroadcastHashJoin
        # building on the batch side, the exploded primary never
        # shuffles, and NO join state store exists at all (the
        # stream-stream state machinery is pure overhead when one side
        # is bounded reference data). Above the budget, shuffle-hash —
        # never leave it to Catalyst, which sizes the primary
        # pre-explode and would broadcast the exploded stream side.
        from nexus_spark.operators.matchup import (_broadcast_budget_bytes,
                                                   _plan_size_bytes)

        s_est = _plan_size_bytes(s)
        if 0 <= s_est <= _broadcast_budget_bytes(secondary.sparkSession):
            s = F.broadcast(s)
        else:
            s = s.hint("shuffle_hash")

    # Same neighbor-cell explosion as the batch operator (pole-cap span
    # included); the explode multiplies only the primary stream, state for
    # it is still keyed by the equi-cells.
    lon_span = F.least(
        F.lit(n_lon_cells // 2),
        F.ceil(F.lit(radius_deg) /
               (F.lit(lon_cell_deg) *
                F.greatest(F.cos(F.radians(F.col("p_lat"))), F.lit(1e-3))))
        .cast("long"),
    )
    p = (p.withColumn("dlat", F.explode(
            F.sequence(F.lit(-lat_span), F.lit(lat_span))))
         .withColumn("dlon", F.explode(F.sequence(-lon_span, lon_span)))
         .withColumn("j_lat_cell", F.col("lat_cell") + F.col("dlat"))
         .withColumn("j_lon_cell",
                     F.pmod(F.col("lon_cell") + F.col("dlon"), n_lon_cells)))

    # The range join compares RAW event times, but the exact tolerance
    # filter below works on floor-second dt_s (the batch operator's
    # contract). Widen the join interval by 1s so it is a strict
    # superset of the dt_s filter even with fractional-second
    # timestamps (raw diff can exceed tol while floor diff == tol);
    # state eviction changes by that same 1s only.
    tol = int(time_tolerance_s) + 1
    joined = p.join(
        s,
        (F.col("j_lat_cell") == F.col("s_lat_cell"))
        & (F.col("j_lon_cell") == F.col("s_lon_cell"))
        & (F.col("s_time") >= F.col("p_time") - F.expr(f"INTERVAL {tol} SECONDS"))
        & (F.col("s_time") <= F.col("p_time") + F.expr(f"INTERVAL {tol} SECONDS")),
    )

    n_half = n_lon_cells // 2
    canonical_dlon = (
        F.pmod(F.col("s_lon_cell") - F.col("lon_cell") + F.lit(n_half),
               F.lit(n_lon_cells)) - F.lit(n_half))
    return (
        joined.where(F.col("dlon") == canonical_dlon)
        .withColumn("dist_km", haversine_km(
            F.col("p_lat"), F.col("p_lon"), F.col("s_lat"), F.col("s_lon")))
        .withColumn("dt_s", F.abs(
            F.unix_timestamp("p_time")
            - F.unix_timestamp("s_time")).cast("long"))
        .where((F.col("dist_km") <= radius_km)
               & (F.col("dt_s") <= time_tolerance_s))
        .select("primary_id", "p_time", "p_lat", "p_lon", "p_value",
                "secondary_id", "s_time", "s_lat", "s_lon", "s_value",
                "dist_km", "dt_s")
    )
