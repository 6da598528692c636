"""Unit tests for the declarative expectations gate (operators/validate)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_expectations_metrics_and_ok(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, None, -1.0), (None, "c", 7.0),
         (None, "zz", None)],
        "k long, s string, v double")
    got = {(r["check"], r["column"]): (r["metric"], r["ok"])
           for r in __import__("nexus_spark.operators.validate",
                               fromlist=["expectations"])
           .expectations(df,
                         not_null={"s": 0.25, "k": 0.0},
                         unique=["k"],
                         ranges={"v": (0.0, 10.0)},
                         accepted={"s": ["a", "b", "c"]},
                         min_rows=3).collect()}
    assert got[("not_null", "s")] == (0.2, 1)       # 1/5 <= 0.25
    assert got[("not_null", "k")] == (0.4, 0)       # 2/5 > 0
    # k: values 1,2,2,NULL,NULL -> 1 non-null dup + 1 extra NULL row
    assert got[("unique", "k")] == (2.0, 0)
    assert got[("in_range", "v")] == (2.0, 0)       # 50.0 and -1.0
    assert got[("accepted_values", "s")] == (1.0, 0)  # "zz"
    assert got[("min_rows", "*")] == (5.0, 1)


def test_expectations_single_scan(spark):
    """The whole suite compiles to ONE pass over the input."""
    from nexus_spark.operators.validate import expectations

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    out = expectations(df, not_null={"v": 0.0}, unique=["k"],
                       ranges={"v": (0.0, 6.0)}, min_rows=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1
    assert len(out.collect()) == 4


def test_ref_integrity_counts_orphans(spark):
    from nexus_spark.operators.validate import ref_integrity

    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = ref_integrity(child, parent, "fk", "pk").collect()[0]
    assert row["metric"] == 1.0 and row["ok"] == 0   # 9 is orphaned
    ok = ref_integrity(parent, parent, "pk", "pk").collect()[0]
    assert ok["metric"] == 0.0 and ok["ok"] == 1


def test_stream_gate_fails_column_order_and_nulls(spark):
    """fails_column: declaration order, NULL verdict counts as failed,
    '' when all rules pass."""
    from pyspark.sql import functions as F

    from nexus_spark.streaming.quality import fails_column

    df = spark.createDataFrame(
        [(300, "en"), (900, "zz"), (None, "en"), (200, None)],
        "n_chars int, lang string")
    rules = [("len_range", F.col("n_chars").between(1, 400)),
             ("lang_ok", F.col("lang").isin("en", "de"))]
    got = [r["f"] for r in df.select(fails_column(rules).alias("f"))
           .collect()]
    assert got == ["", "len_range,lang_ok", "len_range", "lang_ok"]


def test_stream_gate_partitions_feed_exactly(spark, tmp_path):
    """Executed gate drain: good + quarantine is an exact partition of
    the feed (no row lost, none duplicated across micro-batches), and
    quarantined rows carry the right fails tags."""
    from pyspark.sql import functions as F

    from nexus_spark.streaming.quality import stream_quality_gate

    feed_dir = str(tmp_path / "feed")
    rows = [(i, ("x" * 50) if i % 5 else "", "en" if i % 3 else "zz")
            for i in range(40)]
    feed = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    feed.repartition(4).write.parquet(feed_dir)
    schema = spark.read.parquet(feed_dir).schema

    gated = str(tmp_path / "gated")
    rules = [("text_nonempty", F.length("text") > 0),
             ("lang_ok", F.col("lang").isin("en", "de"))]
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    q = stream_quality_gate(stream, rules, gated, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)

    routed = spark.read.parquet(gated)
    g = {r["doc_id"] for r in routed
         .where(F.col("route") == "good").collect()}
    b = {r["doc_id"]: r["fails"]
         for r in routed.where(F.col("route") == "quarantine").collect()}
    assert g.isdisjoint(b)
    assert g | set(b) == set(range(40))
    for i, fails in b.items():
        want = ",".join(n for n, bad in
                        [("text_nonempty", i % 5 == 0),
                         ("lang_ok", i % 3 == 0)] if bad)
        assert fails == want, (i, fails, want)


def test_stream_gate_rejects_reserved_columns(spark, tmp_path):
    """'fails' and 'route' are reserved output/partition names — a feed
    that already carries one must be rejected up front, not silently
    overwritten."""
    import pytest
    from pyspark.sql import functions as F

    from nexus_spark.streaming.quality import stream_quality_gate

    feed_dir = str(tmp_path / "feed")
    spark.createDataFrame([(1, "good")], "doc_id long, route string") \
        .write.parquet(feed_dir)
    stream = (spark.readStream
              .schema(spark.read.parquet(feed_dir).schema)
              .parquet(feed_dir))
    with pytest.raises(ValueError, match="reserved"):
        stream_quality_gate(stream, [("ok", F.lit(True))],
                            str(tmp_path / "gated"),
                            str(tmp_path / "ckpt"))
