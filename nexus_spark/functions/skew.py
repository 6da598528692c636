"""Skew mitigation: key salting for hot-key aggregations and joins.

AQE's skew-join handling (enabled in session.py) covers most cases at
runtime; salting is the explicit tool for EXTREME key skew — e.g. a
training corpus where one domain is 30% of all documents, or a null-heavy
join key. Two-phase aggregation: salt the key, partially aggregate per
(key, salt), then merge per key — turns one hot reducer into `salts`
parallel ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, factor: int = 4) -> DataFrame:
    """Repartition a NARROW input up to the cluster's default parallelism
    before a compute-heavy projection (explode/hash/codec work).

    Why: a small parquet table arrives as a single split, so an
    explode-heavy stage runs on ONE core no matter how many the session
    has (measured: the span-dedup window build serialized 2.5s of md5
    work on one task at sf0.1). At real scale inputs have >= parallelism
    splits and this is a NO-OP — the condition, not the shuffle, is what
    ships to 100 TB.
    """
    if df.isStreaming:
        return df  # .rdd is illegal on a stream; micro-batches parallelize
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Cheap probe first: for a BARE scan/projection the file count bounds
    # the split count from below, and if files alone already provide the
    # parallelism there is nothing to do. len(inputFiles()) is ~25x
    # cheaper than the .rdd conversion (4ms vs ~100ms of analysis per
    # plan build), which this guard sits on the build path of. The
    # shortcut is only valid when no exchange sits below: a shuffle/AQE
    # coalesce/limit can collapse the partitioning well under the scan's
    # file count, so wide plans always take the precise probe.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files * factor >= target and not _has_wide_node(df):
        return df
    if df.rdd.getNumPartitions() * factor < target:
        return df.repartition(target)
    return df


_WIDE_NODE_PREFIXES = (
    "Join", "Aggregate", "Sort", "Repartition", "Window", "Deduplicate",
    "Distinct", "Intersect", "Except", "GlobalLimit", "Limit",
    "CoGroup", "FlatMapGroups", "MapGroups", "FlatMapCoGroups", "Union",
)


def _has_wide_node(df: DataFrame) -> bool:
    """True if the parsed logical plan contains any node that can change
    the output partitioning away from the scan's file splits (exchange,
    coalesce, limit). Conservative: unreadable plan -> True, so callers
    fall back to the precise getNumPartitions probe."""
    try:
        plan = df._jdf.queryExecution().logical().toString()
    except Exception:
        return True
    for line in plan.splitlines():
        node = line.lstrip(" :+-*").split(" ", 1)[0].split("(", 1)[0]
        if node.startswith(_WIDE_NODE_PREFIXES):
            return True
    return False


def with_salt(df: DataFrame, salts: int = 16,
              salt_col: str = "_salt",
              content_cols: list[str] | None = None) -> DataFrame:
    """Row-level salt, stable under task retry and repartitioning.

    The salt is `pmod(xxhash64(content_cols...), salts)` — a pure
    function of row CONTENT, so a task re-attempt or a different input
    partitioning assigns every row the same salt (a
    monotonically_increasing_id round-robin would not: the id depends on
    partition layout, so a salted JOIN built on it could mis-route rows
    re-attempted after failure). With no `content_cols`, all columns are
    hashed.

    Caveat the determinism buys: exact-duplicate rows share a salt, so
    duplicate-heavy data biases the spread. For pure aggregations over a
    hot key, pass the columns that VARY within the hot key (e.g. a
    doc/event id) as `content_cols`; if every column is identical across
    the hot key's rows, salting cannot spread them deterministically —
    pre-aggregate a count instead.
    """
    cols = [F.col(c) for c in (content_cols or df.columns)]
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*cols), F.lit(salts)).cast("int"))


def salted_count(df: DataFrame, key_cols: list[str], salts: int = 16,
                 out_col: str = "cnt") -> DataFrame:
    """Two-phase count per key: groupBy(key, salt) → groupBy(key).

    Equivalent to df.groupBy(keys).count() but the first shuffle spreads a
    hot key over `salts` reducers.
    """
    salted = with_salt(df, salts)
    partial = (salted.groupBy(*key_cols, "_salt")
               .agg(F.count(F.lit(1)).alias("_partial")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("_partial").alias(out_col)))


def salted_broadcast_join(big: DataFrame, small: DataFrame,
                          key_cols: list[str]) -> DataFrame:
    """Hot-key join strategy: when `small` fits in a broadcast there is no
    shuffle at all, so skew in `big` is irrelevant — the degenerate (and
    preferred) salting case. Provided for API symmetry and as the decision
    point: broadcast if you can, salt only when both sides are large."""
    return big.join(F.broadcast(small), key_cols)


def salted_join(skewed: DataFrame, other: DataFrame,
                key_cols: list[str], salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Large-large join under EXTREME key skew, when `other` is too big
    to broadcast and AQE's runtime splitting is insufficient: salt the
    skewed side's rows (content-hash, retry-stable), replicate the other
    side across all `salts` values, and join on (key..., salt) — the hot
    key's rows spread over `salts` reducers instead of one straggler.

    Cost model: replicates `other` x salts through the shuffle — worth it
    only when the skew stalls the job harder than the replication costs
    (the classic salting trade). Only `inner` and `left` joins are
    semantically safe with replication (an unmatched `other` row would
    surface once per salt in right/full joins) — anything else raises.

    The salt is content-derived (see with_salt), so exact-duplicate rows
    on the skewed side share a salt; pass rows through with a
    distinguishing id column in content when the hot key's rows are
    near-identical.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, df in (("skewed", skewed), ("other", other)):
        if "_salt" in df.columns:
            raise ValueError(
                f"salted_join reserves the column name '_salt', which the "
                f"{side} input already carries — rename it before joining")
    s = with_salt(skewed, salts)
    rep = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return s.join(rep, key_cols + ["_salt"], how).drop("_salt")
