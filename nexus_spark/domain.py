"""Domain adapters: derive the geospatial long-format tables from the driver
testdata.

The engine's primary abstraction is the ``observations`` frame
``(dataset, time, lat, lon, value)`` — the relational form of the reference's
tile model after point unnesting (reference:
data-access/nexustiles/model/nexusmodel.py:69-86, one row per valid grid cell
per time step; masked cells are NULL).

The driver testdata has no geo tables, so we derive deterministic
pseudo-geospatial frames from ``lineitem`` / ``events``. Each derivation is a
single SQL fragment executed verbatim by BOTH Spark SQL and the DuckDB oracle
(same text → provable parity); operators then consume the resulting DataFrame
through the library API. Grid layout: 12 lat cells (5° wide, centers
-27.5..27.5) x 12 lon cells (30° wide, centers -165..165), daily time steps,
~1/7 NULL values exercising mask semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nexus_spark.catalog import load_table
from nexus_spark.session import tune

# -- observations: from lineitem ------------------------------------------
# dataset parity from l_suppkey; 1/7 of cells masked (l_linenumber = 7).
OBSERVATIONS_SQL = """
SELECT
  CASE WHEN l_suppkey % 2 = 0 THEN 'sst_a' ELSE 'sst_b' END AS dataset,
  l_shipdate AS time,
  CAST(l_partkey % 12 AS DOUBLE) * 5.0 - 27.5 AS lat,
  CAST(l_orderkey % 12 AS DOUBLE) * 30.0 - 165.0 AS lon,
  CASE WHEN l_linenumber = 7 THEN NULL
       ELSE l_quantity + 10.0 * l_discount END AS value
FROM lineitem
"""

# -- matchup point sets: from events --------------------------------------
# Two interleaved point populations with offset grids so pair distances are
# nonzero and knowable; both share the ts distribution so time-tolerance
# predicates are meaningful (reference matchup semantics:
# analysis/webservice/algorithms_spark/Matchup.py:41-691).
MATCHUP_PRIMARY_SQL = """
SELECT
  event_id AS primary_id,
  ts AS time,
  CAST(user_id % 120 AS DOUBLE) * 0.5 - 29.75 AS lat,
  CAST(event_id % 144 AS DOUBLE) * 2.5 - 178.75 AS lon,
  value AS value
FROM events
WHERE event_id % 2 = 0
"""

MATCHUP_SECONDARY_SQL = """
SELECT
  event_id AS secondary_id,
  ts AS time,
  CAST(user_id % 120 AS DOUBLE) * 0.5 - 29.85 AS lat,
  CAST(event_id % 144 AS DOUBLE) * 2.5 - 178.65 AS lon,
  value AS value
FROM events
WHERE event_id % 2 = 1
"""

# -- tiles: zone-map summary table, derived from observations -------------
# Mirror of the reference's Solr tile document / TileSummary stats
# (reference: nexus-ingest/nexus-sink NexusService.groovy:77-98). A "tile" is
# one (dataset, day, lat-cell, lon-cell) — scalar time like a GridTile.
TILES_SQL = """
SELECT
  dataset,
  CAST(time AS DATE) AS tile_date,
  lat - 2.5 AS min_lat, lat + 2.5 AS max_lat,
  lon - 15.0 AS min_lon, lon + 15.0 AS max_lon,
  MIN(value) AS stats_min,
  MAX(value) AS stats_max,
  SUM(value * COS(RADIANS(lat))) / SUM(CASE WHEN value IS NOT NULL
        THEN COS(RADIANS(lat)) END) AS stats_mean,
  COUNT(value) AS stats_count
FROM ({obs}) obs
GROUP BY dataset, CAST(time AS DATE), lat, lon
""".replace("{obs}", OBSERVATIONS_SQL)

# -- climatology: day-of-year mean of sst_a, with gaps --------------------
# Keyed by day-of-year; doys divisible by 7 are deliberately removed so the
# as-of (doy <= d, most recent) lookup path is exercised, not plain equality
# (reference: data-access/nexustiles/dao/SolrProxy.pyx:137-153).
CLIMATOLOGY_SQL = """
SELECT dataset || '_CLIM' AS dataset, doy, lat, lon,
       AVG(value) AS value
FROM (
  SELECT dataset, DAYOFYEAR(time) AS doy, lat, lon, value
  FROM ({obs}) o
  WHERE dataset = 'sst_a'
) d
WHERE doy % 7 <> 0
GROUP BY dataset, doy, lat, lon
HAVING COUNT(value) > 0
""".replace("{obs}", OBSERVATIONS_SQL)


# Plan-level memo (same rationale as catalog._TABLE_CACHE): the derived
# frame is a lazy plan, reusable within a session — and a single shared
# plan object means an explicit .cache() on it (e.g. bench warmup, or a
# materialized obs view in a deployment) benefits every consumer.
_FRAME_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _frame(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    tune(spark)
    key = (id(spark), sf_dir, sql)
    cached = _FRAME_CACHE.get(key)
    if cached is not None:
        return cached
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    df = spark.sql(sql)
    _FRAME_CACHE[key] = df
    return df


def observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The long-format observations frame — a narrow 5-column projection.

    Materialization policy: when NEXUS_SPARK_MATERIALIZE_OBS is truthy
    (default "1" — right for single-node fixtures, bench, and the driver),
    the derived view is .cache()d per session, the local analog of the lake
    deployment materializing it as a written table. Set it to "0" on a real
    cluster where the full view cannot fit executor memory: plans then
    stay production-shaped — parquet filter pushdown, column pruning and
    partition pruning reach the scan on every query (asserted by
    tests/test_plans.py on the uncached derivation).
    """
    import os

    materialize = os.environ.get("NEXUS_SPARK_MATERIALIZE_OBS", "1") != "0"
    key = (id(spark), sf_dir,
           "observations-cached" if materialize else "observations")
    cached = _FRAME_CACHE.get(key)
    if cached is None:
        cached = _frame(spark, sf_dir, OBSERVATIONS_SQL, ("lineitem",))
        if materialize:
            cached = cached.cache()
        _FRAME_CACHE[key] = cached
    return cached


def _derived(spark: SparkSession, sf_dir: str, key: str, build) -> DataFrame:
    memo_key = (id(spark), sf_dir, key)
    cached = _FRAME_CACHE.get(memo_key)
    if cached is None:
        cached = build()
        _FRAME_CACHE[memo_key] = cached
    return cached


def matchup_primary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _frame(spark, sf_dir, MATCHUP_PRIMARY_SQL, ("events",))


def matchup_secondary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _frame(spark, sf_dir, MATCHUP_SECONDARY_SQL, ("events",))


def tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile summary table, built on the (possibly cached/materialized)
    observations plan — DataFrame form of TILES_SQL (which remains the
    oracle text)."""
    from pyspark.sql import functions as F

    def build() -> DataFrame:
        obs = observations(spark, sf_dir)
        w = F.when(F.col("value").isNotNull(),
                   F.cos(F.radians(F.col("lat"))))
        return (
            obs.groupBy("dataset", F.to_date("time").alias("tile_date"),
                        "lat", "lon")
            .agg(F.min("value").alias("stats_min"),
                 F.max("value").alias("stats_max"),
                 (F.sum(F.col("value") * F.cos(F.radians(F.col("lat"))))
                  / F.sum(w)).alias("stats_mean"),
                 F.count("value").alias("stats_count"))
            .select("dataset", "tile_date",
                    (F.col("lat") - 2.5).alias("min_lat"),
                    (F.col("lat") + 2.5).alias("max_lat"),
                    (F.col("lon") - 15.0).alias("min_lon"),
                    (F.col("lon") + 15.0).alias("max_lon"),
                    "stats_min", "stats_max", "stats_mean", "stats_count")
        )

    return _derived(spark, sf_dir, "tiles", build)


def climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-year climatology, built on the observations plan — DataFrame
    form of CLIMATOLOGY_SQL (which remains the oracle text).

    Cached per session under the same NEXUS_SPARK_MATERIALIZE_OBS policy
    as the observations view: a climatology is a STORED PRODUCT in the
    reference deployment (a published dataset ingested like any other,
    not a per-query derivation), and it is bounded at |grid| x 366 rows
    regardless of observation volume — so the session cache is the local
    analog of reading the published table, and every as-of consumer
    (daily difference, clim map, n-day rollup, deseasonalization) stops
    re-aggregating the corpus on each call."""
    import os

    from pyspark.sql import functions as F

    materialize = os.environ.get("NEXUS_SPARK_MATERIALIZE_OBS", "1") != "0"

    def build() -> DataFrame:
        obs = observations(spark, sf_dir)
        out = (
            obs.where(F.col("dataset") == "sst_a")
            .withColumn("doy", F.dayofyear("time"))
            .where(F.col("doy") % 7 != 0)
            .groupBy(F.concat(F.col("dataset"), F.lit("_CLIM")).alias("dataset"),
                     "doy", "lat", "lon")
            .agg(F.avg("value").alias("value"),
                 F.count("value").alias("_cnt"))
            .where(F.col("_cnt") > 0)
            .drop("_cnt")
        )
        return out.cache() if materialize else out

    return _derived(
        spark, sf_dir,
        "climatology-cached" if materialize else "climatology", build)


def summary_table(spark: SparkSession, sf_dir: str,
                  lat_tile_deg: float = 5.0,
                  lon_tile_deg: float = 30.0) -> DataFrame:
    """Session-materialized per-tile summary (zone map) — the stand-in for
    the lake deployment's written summary table maintained at ingest.
    Memoized + cached per (session, sf_dir, tiling): queries against it
    demonstrate the aggregate-from-summaries win instead of re-paying the
    full-scan aggregation on every call."""
    from nexus_spark.plans.summary import build_summary

    def build() -> DataFrame:
        s = build_summary(observations(spark, sf_dir),
                          lat_tile_deg, lon_tile_deg).cache()
        # Right-size the cached summary's partitioning to its actual row
        # count (~1 partition per 500k tile rows, the zone map is ~1e4x
        # smaller than raw): a session-default 32 partitions would make
        # every downstream interior aggregate pay 32 near-empty tasks —
        # measured ~0.4s of pure scheduler overhead per a2 call at toy
        # scale. The count also EAGERLY materializes the cache (ingest-
        # maintained state; summary_table's contract).
        n = s.count()
        return s.coalesce(max(1, min(n // 500_000 + 1, 200)))

    key = f"summary-{lat_tile_deg}-{lon_tile_deg}"
    return _derived(spark, sf_dir, key, build)


def invalidate(spark: SparkSession | None = None,
               sf_dir: str | None = None) -> None:
    """Drop memoized frames (and unpersist any cached ones) whose session /
    data directory match. Write paths (lake.write_observations /
    delete_partitions) call this so a rewritten directory is never served
    from a stale cached view."""
    doomed = []
    for key in _FRAME_CACHE:
        k_spark, k_dir = key[0], key[1]
        if spark is not None and k_spark != id(spark):
            continue
        if sf_dir is not None and k_dir != sf_dir:
            continue
        doomed.append(key)
    for key in doomed:
        frame = _FRAME_CACHE.pop(key)
        try:
            frame.unpersist()
        except Exception:
            pass
    # Raw-table plan memos for the same directory go too (file listings /
    # footers are re-read next access).
    from nexus_spark import catalog

    for key in [k for k in catalog._TABLE_CACHE
                if (spark is None or k[0] == id(spark))
                and (sf_dir is None or k[1] == sf_dir)]:
        catalog._TABLE_CACHE.pop(key)
    # Operator-level memos (flat vectors, shingle postings) are keyed on the
    # input plan's semanticHash, not the directory, so they can't be targeted
    # per-path — drop them wholesale. Rebuild cost is one materialization;
    # serving stale vectors after a lake rewrite is a correctness bug.
    from nexus_spark.operators import (dedup, graph, retrieval, scrub,
                                       similarity, text)

    similarity.clear_cache()
    dedup.clear_cache()
    retrieval.clear_cache()
    text.clear_cache()
    graph.clear_cache()
    scrub.clear_cache()


def cte(sql_fragment: str, name: str) -> str:
    """Wrap a domain fragment as a named CTE clause body for oracle SQL."""
    return f"{name} AS ({sql_fragment})"
