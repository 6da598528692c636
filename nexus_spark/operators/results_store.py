"""Matchup results warehouse (reference DOMS execution store, D5).

The reference persists each matchup execution to Cassandra tables
doms_executions/doms_params/doms_data/doms_stats
(reference: analysis/webservice/algorithms/doms/ResultsStorage.py:54-275,
schema DomsInitialization.py:55-132) and re-serves them by execution id.

Lake-native form: one parquet dataset partitioned by execution_id plus a
JSON params sidecar — append-only, replayable, and queryable with the same
engine. No extra store.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_execution(results: DataFrame, params: dict, warehouse_dir: str,
                   execution_id: str | None = None) -> str:
    """Persist a matchup result frame under warehouse_dir/execution_id,
    with params + row stats in a sidecar. Returns the execution id."""
    execution_id = execution_id or str(uuid.uuid4())
    path = os.path.join(warehouse_dir, f"execution_id={execution_id}")
    results.write.mode("overwrite").parquet(path)
    meta = {
        "execution_id": execution_id,
        "params": params,
        "time_completed": int(time.time()),
    }
    with open(os.path.join(path, "_params.json"), "w") as fh:
        json.dump(meta, fh)
    return execution_id


def load_execution(spark: SparkSession, warehouse_dir: str,
                   execution_id: str) -> tuple[DataFrame, dict]:
    """Re-read a stored execution (frame + params)."""
    path = os.path.join(warehouse_dir, f"execution_id={execution_id}")
    with open(os.path.join(path, "_params.json")) as fh:
        meta = json.load(fh)
    return spark.read.parquet(path), meta


def execution_stats(results: DataFrame) -> DataFrame:
    """Per-execution summary stats (reference doms_stats analog)."""
    return results.agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("primary_id").alias("n_primaries"),
        F.avg("dist_km").alias("mean_dist_km"),
        F.max("dist_km").alias("max_dist_km"),
        F.avg("dt_s").alias("mean_dt_s"),
    )
