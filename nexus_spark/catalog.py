"""Table catalog: parquet loaders + temp-view registration.

The driver's testdata (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` (stream fixture), ``documents`` and ``embeddings`` (LLM-pipeline
fixtures). At 100 TB these would be partitioned lake tables; here the same
code reads single parquet files — Catalyst pushdown/pruning semantics are
identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nexus_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Plan-level memo: spark.read.parquet re-lists files and re-reads footers
# on every call; the returned DataFrame is just a lazy plan, safe to reuse
# within a session.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    # Nano-precision timestamps are read as long (see session._RUNTIME_CONF);
    # convert back to micro-precision timestamps.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events":
        for field in df.schema.fields:
            if field.name == "ts" and isinstance(field.dataType, LongType):
                df = df.withColumn(
                    "ts",
                    F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, *, suffix: str = "") -> None:
    """Register each table as a temp view (name + optional suffix)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
