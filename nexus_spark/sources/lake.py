"""Partitioned Parquet lake layout — the rebuild's replacement for the
reference's Solr index + Cassandra blob store.

Layout: observations partitioned by (dataset, obs_date). What Solr did for
the reference (reference: data-access/nexustiles/dao/SolrProxy.pyx — bbox /
time / dataset predicate pushdown against an external index) is done here by
three native mechanisms:

1. partition pruning on dataset/obs_date directories (time + dataset
   predicates never touch excluded files),
2. parquet row-group min/max statistics (zone maps) for lat/lon/value,
3. column pruning via the scan's ReadSchema.

delete-by-query (reference: tools/deletebyquery/deletebyquery.py:51-120 —
coordinated Solr+Cassandra deletes) becomes a partition-level overwrite: no
two-store consistency problem exists.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_observations(obs: DataFrame, path: str,
                       mode: str = "overwrite") -> None:
    """Write the long-format observations partitioned by (dataset, date).

    At 100 TB add a bucketing/Z-order pass on (lat, lon) inside partitions;
    the directory scheme is what partition pruning keys on either way.
    """
    (obs.withColumn("obs_date", F.to_date("time"))
        .write.mode(mode)
        .partitionBy("dataset", "obs_date")
        .parquet(path))
    _invalidate_views(path)


def read_observations(spark: SparkSession, path: str) -> DataFrame:
    """Read back with the partition columns restored into query shape."""
    df = spark.read.parquet(path)
    return df.drop("obs_date")  # time column still carries full fidelity


def delete_partitions(spark: SparkSession, path: str, dataset: str,
                      start_date: str | None = None,
                      end_date: str | None = None) -> int:
    """Delete-by-query at partition granularity: remove (dataset, date)
    directories matching the predicate. Returns directories removed.

    Partition-aligned deletes need no rewrite; sub-partition predicates
    would be an overwrite of the affected partitions (read-filter-rewrite),
    which `write_observations(mode='overwrite')` covers.
    """
    removed = 0
    ds_dir = os.path.join(path, f"dataset={dataset}")
    if not os.path.isdir(ds_dir):
        return 0
    for entry in sorted(os.listdir(ds_dir)):
        if not entry.startswith("obs_date="):
            continue
        date_val = entry.split("=", 1)[1]
        if start_date is not None and date_val < start_date:
            continue
        if end_date is not None and date_val > end_date:
            continue
        shutil.rmtree(os.path.join(ds_dir, entry))
        removed += 1
    if removed:
        _invalidate_views(path)
    return removed


def _invalidate_views(path: str) -> None:
    """Drop any session-memoized derived frames built over this directory —
    a rewritten/deleted lake path must never be served from a stale cache."""
    from nexus_spark import domain

    domain.invalidate(sf_dir=path)
