"""Lake layout tests: partition pruning actually prunes (checked in the
plan), delete-by-query removes exactly the matching partitions, salted
aggregation equals plain aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    from nexus_spark import domain
    from nexus_spark.sources.lake import write_observations

    path = str(tmp_path_factory.mktemp("lake") / "obs")
    obs = domain.observations(spark, SF_DIR).where(
        F.col("time") < "1995-03-01")  # keep the fixture small
    write_observations(obs, path)
    return path


def test_roundtrip_preserves_rows(spark, lake):
    from nexus_spark import domain
    from nexus_spark.sources.lake import read_observations

    obs = domain.observations(spark, SF_DIR).where(F.col("time") < "1995-03-01")
    back = read_observations(spark, lake)
    assert back.count() == obs.count()
    assert set(back.columns) == set(obs.columns)


def test_partition_pruning_in_plan(spark, lake):
    """A dataset+date predicate must prune partitions at planning time:
    the scan's partition count must shrink and the filters must appear as
    partition filters, not data filters."""
    df = (spark.read.parquet(lake)
          .where((F.col("dataset") == "sst_a")
                 & (F.col("obs_date") == "1995-02-01")))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # both predicates are on partition columns → pushed as partition
    # filters (dataset + obs_date present in that clause)
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "dataset" in pf and "obs_date" in pf, pf


def test_delete_by_query_partition_aligned(spark, lake):
    from nexus_spark.sources.lake import delete_partitions

    before = spark.read.parquet(lake).where(
        F.col("dataset") == "sst_b").count()
    assert before > 0
    removed = delete_partitions(spark, lake, "sst_b",
                                start_date="1995-02-01")
    assert removed > 0
    spark.catalog.clearCache()
    after = spark.read.parquet(lake).where(
        (F.col("dataset") == "sst_b") & (F.col("obs_date") >= "1995-02-01")
    ).count()
    assert after == 0
    kept = spark.read.parquet(lake).where(
        (F.col("dataset") == "sst_b") & (F.col("obs_date") < "1995-02-01")
    ).count()
    assert kept > 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path_factory):
    """Bucketing both fact tables on the join key pre-partitions the data
    at write time: the join plans with zero Exchange operators — the
    co-located join SURVEY §1.5 calls for at 100 TB."""
    import os

    from nexus_spark.catalog import load_table

    wh = str(tmp_path_factory.mktemp("warehouse"))
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey")
       .option("path", os.path.join(wh, "li_b")).saveAsTable("li_b"))
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey")
       .option("path", os.path.join(wh, "ord_b")).saveAsTable("ord_b"))
    try:
        joined = (spark.table("li_b")
                  .join(spark.table("ord_b"),
                        F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("o_orderpriority")
                  .agg(F.sum("l_quantity").alias("qty")))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # no Exchange feeding the join: bucketed scans satisfy the
        # distribution requirement directly
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # sanity: result matches the unbucketed join
        plain = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty")))
        got = {r["o_orderpriority"]: round(r["qty"], 4) for r in joined.collect()}
        want = {r["o_orderpriority"]: round(r["qty"], 4) for r in plain.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_salted_count_equals_plain(spark):
    from nexus_spark.catalog import load_table
    from nexus_spark.functions.skew import salted_count

    ev = load_table(spark, SF_DIR, "events")
    plain = {r["event_type"]: r["cnt"] for r in
             ev.groupBy("event_type").agg(
                 F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["event_type"]: r["cnt"] for r in
              salted_count(ev, ["event_type"], salts=8).collect()}
    assert salted == plain


def test_with_salt_stable_across_repartition(spark):
    """The salt must be a pure function of row content: re-laying-out the
    input (as a task retry or a different upstream partitioning would)
    must assign every row the identical salt — the property a salted
    JOIN needs to not mis-route rows after recomputation."""
    from nexus_spark.functions.skew import with_salt

    ev = (spark.range(5000)
          .select(F.col("id"), (F.col("id") % 7).alias("k")))
    a = {r["id"]: r["_salt"] for r in with_salt(ev, salts=8).collect()}
    b = {r["id"]: r["_salt"]
         for r in with_salt(ev.repartition(13, "k"), salts=8).collect()}
    c = {r["id"]: r["_salt"]
         for r in with_salt(ev.coalesce(1), salts=8).collect()}
    assert a == b == c
    assert len(set(a.values())) == 8  # spread actually uses all salts


def test_zorder_write_tightens_rowgroup_zone_maps(spark, tmp_path):
    """The zorder=True pass must shrink per-row-group lat/lon min-max
    spans (the zone maps bbox scans prune on) vs insertion order.

    Uses ONE large single-day partition: the tightening only exists when
    a partition spans many row groups (at real scale a day holds millions
    of rows; a daily 144-cell fixture fits one group and shows nothing).
    """
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from nexus_spark.sources.lake import write_observations

    obs = (spark.range(120000).select(
        F.lit("big").alias("dataset"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("time"),
        (F.rand(7) * 180 - 90).alias("lat"),
        (F.rand(11) * 360 - 180).alias("lon"),
        F.rand(13).alias("value")).coalesce(1))
    small = {"parquet.block.size": str(256 * 1024),
             "parquet.page.size": str(16 * 1024)}

    def span_sum(path: str) -> tuple[float, int]:
        total, groups = 0.0, 0
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
            meta = pq.ParquetFile(f).metadata
            for g in range(meta.num_row_groups):
                rg = meta.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema == "lat":
                        st = col.statistics
                        total += float(st.max) - float(st.min)
                        groups += 1
        return total, groups

    write_observations(obs, str(tmp_path / "plain"), options=small)
    write_observations(obs, str(tmp_path / "zorder"), zorder=True,
                       options=small)
    plain_span, plain_groups = span_sum(str(tmp_path / "plain"))
    z_span, z_groups = span_sum(str(tmp_path / "zorder"))
    assert plain_groups > 3 and z_groups > 3  # stats exist across groups
    # Random order covers ~full extent per group; Z order covers tight
    # boxes -> total span collapses.
    assert z_span < plain_span * 0.5, (z_span, plain_span)


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from nexus_spark.functions.skew import salted_join

    # 80% of the left side is one hot key
    left = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 5 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        (F.col("id") * 3).alias("payload"))
    right = spark.createDataFrame(
        [("hot", 1.5), ("k0", 2.5), ("k5", 3.5), ("nomatch", 9.9)],
        ["k", "w"])

    def rows(df):
        return sorted(tuple(r) for r in
                      df.select("row_id", "k", "payload", "w").collect())

    plain = left.join(right, "k")
    salted = salted_join(left, right, ["k"], salts=8)
    assert rows(salted) == rows(plain) and plain.count() > 0

    plain_l = left.join(right, "k", "left")
    salted_l = salted_join(left, right, ["k"], salts=8, how="left")
    assert rows(salted_l) == rows(plain_l)
    assert salted_l.count() == 1000  # left join preserves every left row

    import pytest
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")

    # reserved-column guard: a pre-existing _salt on EITHER side would be
    # silently clobbered/dropped — must raise instead
    with pytest.raises(ValueError, match="_salt"):
        salted_join(left.withColumn("_salt", F.lit(0)), right, ["k"])
    with pytest.raises(ValueError, match="_salt"):
        salted_join(left, right.withColumn("_salt", F.lit(0)), ["k"])


def test_compact_partitions_preserves_rows(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from nexus_spark.sources.lake import compact_partitions

    path = str(tmp_path / "lake")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 2).alias("p"),
        (F.col("id") * 1.5).alias("v"))
    # simulate streaming-append fragmentation: 8 appends of 8 files each
    for _ in range(8):
        df.repartition(8).write.mode("append").partitionBy("p").parquet(path)
    before = spark.read.parquet(path)
    n_before, sum_before = before.count(), \
        before.agg(F.sum("v")).first()[0]

    def files_in(rel):
        d = os.path.join(path, rel)
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(files_in("p=0")) == 64
    done = compact_partitions(spark, path, target_bytes=1 << 30)
    assert set(done) == {"p=0", "p=1"} and done["p=0"] == 64
    assert len(files_in("p=0")) == 1  # tiny partition -> one file
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert abs(after.agg(F.sum("v")).first()[0] - sum_before) < 1e-6
    assert set(after.columns) == set(before.columns)
    # idempotent: second pass rewrites nothing
    assert compact_partitions(spark, path, target_bytes=1 << 30) == {}
