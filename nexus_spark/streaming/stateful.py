"""Custom stateful streaming operator: running per-key aggregates with
explicit state (applyInPandasWithState).

The reference has no streaming surface; this is the Spark-native extension
point for operators that windowed aggregates cannot express — e.g. a
running seen-set for streaming dedup, or cross-batch running statistics.
State is per-key, stored in the state store, bounded by timeouts.

The closure is fully self-contained (no package imports) so Python workers
can unpickle it regardless of deployment layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("mx", DoubleType()),
])


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) maintained across micro-batches.

    Works on a streaming frame grouped by user_id; each batch updates the
    persisted state and emits the new running totals for keys seen in the
    batch.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total, mx = 0, 0.0, float("-inf")
        if state.exists:
            n, total, mx = state.get
        for pdf in pdfs:
            vals = pdf["value"].astype(float)
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        })

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
