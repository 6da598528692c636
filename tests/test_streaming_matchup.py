"""Stream-stream matchup: the watermarked radius/time join must converge
to the batch matchup output (kappa check), on synthetic pinpoint cases and
on the domain matchup fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _stream(spark, df, tmp_path, name, nfiles=3):
    src = str(tmp_path / name)
    df.repartition(nfiles).write.parquet(src)
    return (spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1).parquet(src))


def _drain(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)


def test_static_frames_equal_batch_matchup(spark):
    """On static inputs the streaming operator IS the batch join."""
    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup
    from nexus_spark.streaming.matchup import streaming_matchup

    p = domain.matchup_primary(spark, SF_DIR)
    s = domain.matchup_secondary(spark, SF_DIR)
    got = {(r.primary_id, r.secondary_id)
           for r in streaming_matchup(p, s, radius_km=300.0,
                                      time_tolerance_s=86400).collect()}
    want = {(r.primary_id, r.secondary_id)
            for r in matchup(p, s, radius_km=300.0,
                             time_tolerance_s=86400).collect()}
    assert got == want and len(want) > 0


def test_static_secondary_build_is_size_guarded(spark, monkeypatch):
    """Round-14 size guard (the s8 guard applied to the stream): a static
    secondary within the broadcast budget is pinned as a broadcast build
    (the exploded primary never shuffles, no join state store); over
    budget it falls back to shuffle-hash — never Catalyst's own choice,
    which sizes the primary pre-explode."""
    from nexus_spark import domain
    from nexus_spark.streaming.matchup import streaming_matchup

    p = domain.matchup_primary(spark, SF_DIR)
    s = domain.matchup_secondary(spark, SF_DIR)

    def plan(budget_mb: str) -> str:
        monkeypatch.setenv("NEXUS_SPARK_MATCHUP_BROADCAST_MB", budget_mb)
        df = streaming_matchup(p, s, radius_km=300.0,
                               time_tolerance_s=86400)
        return df._jdf.queryExecution().executedPlan().toString()

    under = plan("64")
    assert "BroadcastHashJoin" in under, under[:800]
    over = plan("0")
    assert "ShuffledHashJoin" in over, over[:800]
    assert "BroadcastHashJoin" not in over


def test_streams_converge_to_batch(spark, tmp_path):
    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup
    from nexus_spark.streaming.matchup import streaming_matchup

    p = domain.matchup_primary(spark, SF_DIR)
    s = domain.matchup_secondary(spark, SF_DIR)
    ps = _stream(spark, p, tmp_path, "p_stream")
    ss = _stream(spark, s, tmp_path, "s_stream")

    # Watermark covers the whole fixture span: replay order is arbitrary,
    # so nothing may be treated as late in the parity run.
    out = streaming_matchup(ps, ss, radius_km=300.0, time_tolerance_s=86400,
                            watermark="3650 days")
    _drain(out, "mu_stream")

    got = {(r.primary_id, r.secondary_id, round(r.dist_km, 6))
           for r in spark.table("mu_stream").collect()}
    want = {(r.primary_id, r.secondary_id, round(r.dist_km, 6))
            for r in matchup(p, s, radius_km=300.0,
                             time_tolerance_s=86400).collect()}
    assert got == want and len(want) > 0


def test_match_once_as_downstream_batch(spark, tmp_path):
    """The kappa split for match_once: stream emits all pairs, a batch
    ranking over the sink yields the nearest-per-primary set."""
    from pyspark.sql import Window

    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup
    from nexus_spark.streaming.matchup import streaming_matchup

    p = domain.matchup_primary(spark, SF_DIR)
    s = domain.matchup_secondary(spark, SF_DIR)
    ps = _stream(spark, p, tmp_path, "p1_stream")
    ss = _stream(spark, s, tmp_path, "s1_stream")
    out = streaming_matchup(ps, ss, radius_km=300.0, time_tolerance_s=86400,
                            watermark="3650 days")
    _drain(out, "mu1_stream")

    w = Window.partitionBy("primary_id").orderBy(
        F.round(F.col("dist_km"), 6).asc(), F.col("secondary_id").asc())
    got = {(r.primary_id, r.secondary_id)
           for r in spark.table("mu1_stream")
           .withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1).collect()}
    want = {(r.primary_id, r.secondary_id)
            for r in matchup(p, s, radius_km=300.0, time_tolerance_s=86400,
                             match_once=True).collect()}
    assert got == want and len(want) > 0
