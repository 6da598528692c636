"""Declarative data-quality expectations over any table — the
validation gate a lake pipeline runs after every ingest/transform step
(the Great-Expectations / dbt-test pattern, re-expressed as Spark
aggregates). The reference has no equivalent; its ingest trusts the
granule reader. At 100 TB a bad batch is cheaper to QUARANTINE at the
expectations gate than to scrub out of downstream state.

Scale design: every per-table check compiles to ONE aggregate
expression, so a whole check suite is a single corpus scan (one
groupBy().agg() — map-side combined; count-distinct checks add an
Expand, not a second scan). The per-check result rows are produced by
exploding a one-row literal-array projection of that aggregate — no
driver state beyond the k-row check list. Referential checks are the
one exception (they are joins by nature): LEFT ANTI against the parent
keys, which Spark broadcasts when the parent is dimension-sized.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectations(df: DataFrame,
                 not_null: dict[str, float] | None = None,
                 unique: list[str] | None = None,
                 ranges: dict[str, tuple[float, float]] | None = None,
                 accepted: dict[str, list] | None = None,
                 min_rows: int | None = None) -> DataFrame:
    """Run a declarative check suite over `df` in ONE aggregate pass.

    - not_null: {col: max_null_fraction} — metric = null fraction.
    - unique: [col] — metric = duplicated-row count (n - n_distinct,
      NULLs counted as one group by Spark/SQL distinct semantics).
    - ranges: {col: (lo, hi)} — metric = count outside [lo, hi]
      (NULLs are not range violations; declare them via not_null).
    - accepted: {col: [values]} — metric = count of non-NULL values
      outside the accepted set.
    - min_rows: metric = row count, ok when >= min_rows.

    Output: (check, column, metric DOUBLE, threshold DOUBLE, ok INT) —
    one row per declared check, deterministic order-free content.
    """
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    specs: list[tuple[str, str, float, str]] = []  # check, col, thr, expr
    for i, (c, thr) in enumerate(sorted((not_null or {}).items())):
        aggs.append((F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                     .cast("double")).alias(f"_nn{i}"))
        specs.append(("not_null", c, float(thr), f"_nn{i}/_n"))
    for i, c in enumerate(sorted(unique or [])):
        aggs.append(F.count_distinct(F.col(c)).cast("double")
                    .alias(f"_u{i}"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("double").alias(f"_un{i}"))
        # duplicates among non-NULLs plus extra NULL rows beyond one
        specs.append(("unique", c, 0.0,
                      f"(_n - _un{i} - _u{i}) + "
                      f"(CASE WHEN _un{i} > 1 THEN _un{i} - 1 ELSE 0 END)"))
    for i, (c, (lo, hi)) in enumerate(sorted((ranges or {}).items())):
        aggs.append(F.sum(F.when(F.col(c).isNotNull()
                                 & ((F.col(c) < F.lit(lo))
                                    | (F.col(c) > F.lit(hi))),
                                 1).otherwise(0))
                    .cast("double").alias(f"_r{i}"))
        specs.append(("in_range", c, 0.0, f"_r{i}"))
    for i, (c, vals) in enumerate(sorted((accepted or {}).items())):
        aggs.append(F.sum(F.when(F.col(c).isNotNull()
                                 & ~F.col(c).isin(list(vals)),
                                 1).otherwise(0))
                    .cast("double").alias(f"_a{i}"))
        specs.append(("accepted_values", c, 0.0, f"_a{i}"))
    if min_rows is not None:
        specs.append(("min_rows", "*", float(min_rows), "_n"))
    if not specs:
        raise ValueError("no checks declared")

    one = df.groupBy().agg(*aggs)
    rows = ", ".join(
        f"named_struct('check', '{chk}', 'column', '{col}', "
        f"'metric', CAST({expr} AS DOUBLE), "
        f"'threshold', CAST({thr!r} AS DOUBLE))"
        for chk, col, thr, expr in specs)
    out = (one.select(F.explode(F.expr(f"array({rows})")).alias("r"))
           .select("r.*"))
    ok = F.when(F.col("check") == "min_rows",
                F.col("metric") >= F.col("threshold")) \
        .otherwise(F.col("metric") <= F.col("threshold"))
    return out.withColumn("ok", ok.cast("int"))


def ref_integrity(child: DataFrame, parent: DataFrame,
                  child_key: str, parent_key: str,
                  check: str = "ref_integrity") -> DataFrame:
    """Orphaned-foreign-key check: rows of `child` whose key has no
    match in `parent` (NULL keys are not orphans — declare them via
    not_null). LEFT ANTI join; the parent side projects only its key,
    so a dimension-sized parent broadcasts.

    Output: same (check, column, metric, threshold, ok) row shape as
    expectations(), one row.
    """
    orphans = (child.where(F.col(child_key).isNotNull())
               .join(parent.select(F.col(parent_key).alias(child_key))
                     .distinct(),
                     child_key, "left_anti")
               .groupBy().agg(F.count(F.lit(1)).cast("double")
                              .alias("metric")))
    return orphans.select(
        F.lit(check).alias("check"), F.lit(child_key).alias("column"),
        "metric", F.lit(0.0).alias("threshold"),
        (F.col("metric") <= 0.0).cast("int").alias("ok"))
