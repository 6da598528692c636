"""Unit tests for deterministic sampling / sequence packing / graph
clustering — the dedup-cluster + data-mixing layer of the pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_spark.operators.dedup import (cluster_representatives,
                                         connected_components)
from nexus_spark.operators.sampling import (fraction_threshold,
                                            pack_sequences,
                                            stratified_sample_exact,
                                            stratified_sample_fraction)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + i % 17)),
             ["en", "es", "fr"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_fraction_threshold_bounds():
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(1.0) == "g"  # sorts after every hex digit
    assert fraction_threshold(0.5) == "80000000"
    with pytest.raises(ValueError):
        fraction_threshold(1.5)


def test_fraction_sample_deterministic_and_edge_rates(spark, docs):
    a = stratified_sample_fraction(docs, "lang", {"en": 0.5, "es": 0.2})
    b = stratified_sample_fraction(docs, "lang", {"en": 0.5, "es": 0.2})
    ids_a = sorted(r.doc_id for r in a.collect())
    assert ids_a == sorted(r.doc_id for r in b.collect())
    # unlisted stratum defaults to rate 0
    assert not any(r.lang == "fr" for r in a.collect())
    # rate 1.0 keeps the whole stratum, 0.0 keeps none
    full = stratified_sample_fraction(docs, "lang", {"en": 1.0})
    assert full.count() == docs.where("lang = 'en'").count()
    # approximate rate: md5 is uniform, 100 en docs at 0.5 → binomial
    kept_en = a.where("lang = 'en'").count()
    assert 30 <= kept_en <= 70


def test_fraction_sample_is_scan_filter(spark, docs):
    plan = stratified_sample_fraction(
        docs, "lang", {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle at any scale


def test_exact_n_per_stratum(spark, docs):
    out = stratified_sample_exact(docs, "lang", 7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.sample_rank)
    assert set(by_lang) == {"en", "es", "fr"}
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, 8))
    # n larger than the stratum: capped at stratum size
    tiny = docs.where("doc_id < 4")
    got = stratified_sample_exact(tiny, "lang", 99).count()
    assert got == 4


def test_pack_sequences_invariants(spark, docs):
    out = pack_sequences(docs, budget=64, n_buckets=4).collect()
    assert len(out) == 300  # every doc assigned
    for r in out:
        assert 0 <= r.offset_in_pack < 64
        assert r.bucket == r.doc_id % 4
        assert r.pack_id >= 0
    # per bucket: token stream is contiguous (offset = cumsum mod budget)
    by_bucket = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        cum = by_bucket.get(r.bucket, 0)
        assert r.pack_id == cum // 64
        assert r.offset_in_pack == cum % 64
        by_bucket[r.bucket] = cum + r.n_tokens


def test_pack_sequences_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_connected_components_chain_and_singletons(spark):
    # chain 1-2-3-4-5 (diameter 4 > one propagation round), pair 10-11,
    # singletons 20, 21
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10, 11, 20, 21)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["id_a", "id_b"])
    got = {r.doc_id: r.component
           for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 20: 20, 21: 21}


def test_connected_components_string_ids(spark):
    # Non-numeric ids: SUM(comp) is NULL, so the label-sum convergence
    # check would fake a fixpoint after round 1 and under-merge the
    # d1..d5 chain (regression test for the changed-count fallback).
    nodes = spark.createDataFrame(
        [(f"d{i}",) for i in (1, 2, 3, 4, 5, 8, 9)], ["doc_id"])
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d3", "d4"), ("d4", "d5")],
        ["id_a", "id_b"])
    got = {r.doc_id: r.component
           for r in connected_components(pairs, nodes).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "d4": "d1",
                   "d5": "d1", "d8": "d8", "d9": "d9"}


def test_cluster_representatives_rollup(spark):
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    comps = connected_components(pairs, nodes)
    stats = {r.component: (r.cluster_size, r.n_duplicates)
             for r in cluster_representatives(comps).collect()}
    assert stats == {1: (3, 2), 7: (1, 0)}


def test_winnow_shared_run_guarantee(spark):
    # Winnowing guarantee: a shared token run of length >= k+w-1 (= 7 with
    # k=4, w=4) always yields at least one shared fingerprint.
    from nexus_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    shared = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [(1, f"unrelated prefix words here {shared} and a tail"),
         (2, f"{shared} totally different suffix content follows now"),
         (3, "no overlap with anything else at all whatsoever")],
        ["doc_id", "text"])
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 7-token run must share a fp"
    assert not (by_doc[1] & by_doc[3])
    # density: winnowed set is strictly sparser than the full k-gram set
    n_words = len(docs.collect()[0].text.split(" "))
    assert len(by_doc[1]) < n_words - 3
    pairs = winnow_pairs(docs, threshold=0.01).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_approx_profile_within_bounds(spark):
    # Sketch accuracy vs exact: HLL++ at rsd=0.02 and GK quantiles at
    # accuracy 10000 on ~2000-row groups must land near the exact answers.
    from nexus_spark.operators.sql_surface import approx_profile

    rows = [(i, i % 500, f"t{i % 3}", float(i % 100)) for i in range(6000)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value"])
    prof = {r.event_type: r for r in approx_profile(ev).collect()}
    exact = {r.event_type: r for r in ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("d"),
        F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("q"),
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(prof) == set(exact)
    for t, ex in exact.items():
        assert abs(prof[t].approx_users - ex.d) <= max(3, 0.1 * ex.d)
        for approx_q, exact_q in zip(prof[t].value_quantiles, ex.q):
            assert abs(approx_q - exact_q) <= 2.0
        assert prof[t].n_events == ex.n


def test_merge_summaries_incremental_equals_full(spark):
    from nexus_spark import domain
    from nexus_spark.plans.summary import build_summary, merge_summaries
    from tests.conftest import SF_DIR

    obs = domain.observations(spark, SF_DIR)
    full = build_summary(obs)
    old = build_summary(obs.where("lat < 0"))
    delta = build_summary(obs.where("lat >= 0"))
    merged = merge_summaries(old, delta)

    def canon(df):
        return sorted(
            tuple(round(v, 9) if isinstance(v, float) else v for v in r)
            for r in df.collect())

    assert canon(merged) == canon(full)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from nexus_spark.sources.lake import read_table, write_bucketed

    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the non-broadcast path: at 100 TB neither fact side fits a
        # broadcast, which is exactly the regime bucketing exists for (on
        # this toy frame the planner would otherwise just broadcast).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(a, "bkt_a", "k", n_buckets=4)
        write_bucketed(b, "bkt_b", "k", n_buckets=4)
        joined = read_table(spark, "bkt_a").join(read_table(spark, "bkt_b"),
                                                 "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located layout: the write-time shuffle is the ONLY shuffle
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_connected_components_memoized(spark):
    from nexus_spark.operators import dedup

    dedup._CC_CACHE.clear()
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (2, 3)], ["id_a", "id_b"])
    a = dedup.connected_components(pairs, nodes)
    b = dedup.connected_components(pairs, nodes)
    assert a is b  # one convergence shared by every consumer
    assert len(dedup._CC_CACHE) == 1
    dedup.clear_cache()
    assert not dedup._CC_CACHE


def test_cc_clear_releases_checkpoint_blocks_eagerly(spark):
    """clear_cc_result_cache() must UNPERSIST the memoized labeling's
    localCheckpoint blocks, not just drop the reference (round-11,
    same class as the graph edge memo): the bench sweep clears this
    cache before every timed query, so a GC-timed drop accumulates one
    orphaned label checkpoint per timed row."""
    from nexus_spark.operators import dedup

    dedup.clear_cache()

    def _persisted_ids():
        return {i.id() for i in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    before = _persisted_ids()
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["id_a", "id_b"])
    dedup.connected_components(pairs, nodes).count()
    created = _persisted_ids() - before
    assert created, "CC should persist edge + label checkpoints"
    dedup.clear_cache()
    assert not (_persisted_ids() & created), (
        "clear left CC localCheckpoint blocks persisted")


def test_corpus_mix_plan_is_fused(spark):
    import __spark_entry__ as mod
    from tests.conftest import SF_DIR_T2

    df = mod.queries()["d_corpus_mix"](spark, SF_DIR_T2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # curation fingerprint aggregate + packing bucket window: the mixing
    # sample must fuse as a filter, adding NO shuffle of its own
    assert plan.count("Exchange hashpartitioning") <= 3


def test_apply_dedup_keeps_one_survivor_per_cluster(spark):
    from nexus_spark.operators.dedup import apply_dedup, connected_components

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 7, 9)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    comps = connected_components(pairs, docs)
    kept = sorted(r.doc_id for r in apply_dedup(docs, comps).collect())
    assert kept == [1, 7, 9]  # cluster {1,2,3} -> 1; singletons pass


def test_connected_components_log_rounds_on_chain(spark):
    # pointer jumping: a 65-node chain (diameter 64) must converge in
    # O(log d) rounds, not 64 propagation rounds
    from nexus_spark.operators import dedup

    dedup._CC_CACHE.clear()
    n = 65
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    got = {r.doc_id: r.component
           for r in dedup.connected_components(pairs, nodes).collect()}
    assert got == {i: 0 for i in range(n)}
    assert dedup._LAST_CC_ROUNDS <= 10, dedup._LAST_CC_ROUNDS


def test_contamination_check_planted_overlap(spark):
    from nexus_spark.operators.dedup import clear_cache, contamination_check

    clear_cache()  # postings memo is keyed per plan; keep the test hermetic
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    train = spark.createDataFrame(
        [(1, "prefix words then the quick brown fox appears here"),
         (2, "completely unrelated training content with no overlap"),
         (3, "the quick brown fox jumps over the lazy dog verbatim copy")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in contamination_check(train, bench).collect()}
    assert set(got) == {1, 3}  # doc 2 is clean -> absent
    # doc 3 contains the whole benchmark text: every benchmark shingle hits
    assert got[3].n_hits >= 6
    assert got[3].contamination > got[1].contamination
    for r in got.values():
        assert 0 < r.contamination <= 1.0
        assert r.n_hits <= r.n_shingles


def test_temperature_sample_alpha_semantics(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.sampling import temperature_sample

    rows = ([(i, "big") for i in range(4000)]
            + [(i + 10000, "mid") for i in range(900)]
            + [(i + 20000, "small") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    def achieved(alpha, target):
        out = temperature_sample(df, "grp", alpha=alpha,
                                 target_total=target)
        return {r["grp"]: r["n"] for r in
                out.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
                .collect()}

    # alpha=1: natural proportions (rates equal across groups)
    nat = achieved(1.0, 1000)
    assert nat["big"] > nat["mid"] > nat["small"]
    assert abs(nat["big"] / nat["small"] - 40) < 15  # ~4000/100
    # alpha=0: uniform target -> small group fully kept, big downsampled
    uni = achieved(0.0, 300)
    assert uni["small"] == 100                       # rate clamped to 1
    assert abs(uni["big"] - 100) < 40
    # alpha=0.3 sits between: tail boosted vs natural
    mid = achieved(0.3, 1000)
    assert mid["small"] / 100 > nat["small"] / 100   # higher keep rate
    # determinism: identical re-run selects identical rows
    a = {r["doc_id"] for r in
         temperature_sample(df, "grp", 0.3, 1000).collect()}
    b = {r["doc_id"] for r in
         temperature_sample(df.repartition(7), "grp", 0.3,
                            1000).collect()}
    assert a == b


def test_chunk_documents_coverage_and_overlap(spark):
    from nexus_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(50))),  # 50 tokens
         (2, "a b c")],                              # shorter than chunk
        "doc_id long, text string")
    out = [r for r in chunk_documents(docs, chunk_tokens=24,
                                      stride=16).collect()]
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # starts 0,16,32,48 (48 <= 49); window sizes 24,24,18,2
    assert [r["chunk_start"] for r in c1] == [0, 16, 32, 48]
    assert [r["n_chunk_tokens"] for r in c1] == [24, 24, 18, 2]
    assert c1[0]["chunk_text"].split(" ")[0] == "t0"
    assert c1[1]["chunk_text"].split(" ")[0] == "t16"
    assert c1[-1]["chunk_text"] == "t48 t49"
    # every token covered; consecutive chunks overlap by 8
    assert set(" ".join(r["chunk_text"] for r in c1).split(" ")) \
        == {f"t{i}" for i in range(50)}
    assert c1[0]["chunk_text"].split(" ")[16:] \
        == c1[1]["chunk_text"].split(" ")[:8]
    assert by_doc[2][0]["chunk_text"] == "a b c"
    assert by_doc[2][0]["n_chunk_tokens"] == 3


def test_weighted_sample_topn(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.sampling import weighted_sample_topn

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        # weights 1 vs 100: heavy rows should dominate the sample
        F.when(F.col("id") % 2 == 0, 100).otherwise(1).alias("wt"))
    out = weighted_sample_topn(docs, "wt", n=50, seed="t").collect()
    assert len(out) == 50
    assert [r["sample_rank"] for r in
            sorted(out, key=lambda r: r["es_key"])] == list(range(1, 51))
    heavy = sum(1 for r in out if r["weight"] == 100)
    assert heavy >= 40  # 100:1 weights -> overwhelmingly heavy rows
    # deterministic under repartitioning
    again = weighted_sample_topn(docs.repartition(7), "wt", n=50,
                                 seed="t").collect()
    assert {(r["doc_id"], r["sample_rank"]) for r in again} \
        == {(r["doc_id"], r["sample_rank"]) for r in out}
    # zero/negative weights are excluded
    docs0 = spark.range(10).select(F.col("id").alias("doc_id"),
                                   F.lit(0).alias("wt"))
    assert weighted_sample_topn(docs0, "wt", n=5).count() == 0


def test_write_corpus_shards_layout(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from nexus_spark.operators.sampling import shuffle_shards
    from nexus_spark.sources.lake import write_corpus_shards

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"))
    path = str(tmp_path / "shards")
    write_corpus_shards(docs, path, n_shards=4, seed="s")

    dirs = sorted(e for e in os.listdir(path) if e.startswith("shard="))
    assert len(dirs) == 4
    back = spark.read.json(path)
    assert back.count() == 300
    # per-shard membership equals the logical assignment
    want = {(r["doc_id"], r["shard"])
            for r in shuffle_shards(docs, n_shards=4, seed="s").collect()}
    got = {(r["doc_id"], int(r["shard"])) for r in back.collect()}
    assert got == want


def test_write_shard_manifest(spark, tmp_path):
    from pyspark.sql import functions as F

    from nexus_spark.sources.lake import (write_corpus_shards,
                                          write_shard_manifest)

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c").alias("text"),
        F.lit(3).alias("n_tokens"))
    path = str(tmp_path / "exp")
    write_corpus_shards(docs, path, n_shards=4, seed="m")
    write_shard_manifest(spark, path, tokens_col="n_tokens")

    m = {r["shard"]: r for r in
         spark.read.parquet(f"{path}/_manifest").collect()}
    assert sum(r["n_rows"] for r in m.values()) == 200
    assert all(r["n_tokens"] == 3 * r["n_rows"] for r in m.values())
    # the _-prefixed manifest dir is skipped by shard reads
    assert spark.read.json(path).count() == 200


def test_cap_per_group_deterministic_and_bounded(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.sampling import cap_per_group

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
        (F.col("id") % 7).cast("double").alias("quality"))

    capped = cap_per_group(df, "source", 10)
    rows = capped.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r)
    assert set(per) == {"0", "1", "2"}
    assert all(len(v) == 10 for v in per.values())  # bounded per group
    assert all(sorted(r["group_rank"] for r in v) == list(range(1, 11))
               for v in per.values())
    # deterministic: identical selection on re-run
    again = {(r["doc_id"], r["group_rank"])
             for r in cap_per_group(df, "source", 10).collect()}
    assert again == {(r["doc_id"], r["group_rank"]) for r in rows}

    # order_col keeps the HIGHEST-quality rows
    by_q = cap_per_group(df, "source", 5, order_col="quality")
    assert all(r["quality"] == 6.0 for r in by_q.collect())

    import pytest
    with pytest.raises(ValueError, match="positive"):
        cap_per_group(df, "source", 0)


def test_grouping_sets_levels_are_consistent(spark):
    """gid labels the aggregation level; subtotal counts must re-add to
    the grand total, and per-flag subtotals must equal the sum of their
    detail cells."""
    from nexus_spark.operators.sql_surface import lineitem_grouping_sets

    rows = [("A", "F", 1.0, 10.0), ("A", "F", 2.0, 20.0),
            ("A", "O", 3.0, 30.0), ("R", "F", 4.0, 40.0)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, "
              "l_quantity double, l_extendedprice double")
    got = lineitem_grouping_sets(df).collect()
    detail = {(r.l_returnflag, r.l_linestatus): r for r in got if r.gid == 0}
    flags = {r.l_returnflag: r for r in got if r.gid == 1}
    total = [r for r in got if r.gid == 3]
    assert len(detail) == 3 and len(flags) == 2 and len(total) == 1
    assert total[0].n_items == 4 and abs(total[0].sum_qty - 10.0) < 1e-12
    assert flags["A"].n_items == 3 and abs(flags["A"].sum_qty - 6.0) < 1e-12
    assert detail[("A", "F")].n_items == 2


def test_step_funnel_requires_order(spark):
    """A click BEFORE the user's first view must not count as reaching
    the click step; a later one does."""
    from nexus_spark.operators.sql_surface import event_step_funnel

    rows = [
        # u1: click precedes view -> reaches view only
        (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "view", 0.0, "{}"),
        # u2: full ordered path
        (3, "2024-01-02 09:00:00", 2, "view", 0.0, "{}"),
        (4, "2024-01-02 09:30:00", 2, "click", 0.0, "{}"),
        (5, "2024-01-02 10:00:00", 2, "purchase", 0.0, "{}"),
        # u3: never views
        (6, "2024-01-03 09:00:00", 3, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string").withColumn(
        "ts", F.to_timestamp("ts"))
    got = {r.step: r.n_users for r in event_step_funnel(df).collect()}
    assert got == {"all_users": 3, "view": 2, "click": 1, "purchase": 1}


def test_retention_cohort_offsets(spark):
    """Users land in their first-event week's cohort; activity counts at
    floor(days-since-first/7)."""
    from nexus_spark.operators.sql_surface import event_retention_cohorts

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),   # cohort w0
        (2, "2024-01-06 10:00:00", 1, "view", 0.0, "{}"),   # offset 0 (5d)
        (3, "2024-01-09 10:00:00", 1, "view", 0.0, "{}"),   # offset 1 (8d)
        (4, "2024-01-10 10:00:00", 2, "view", 0.0, "{}"),   # cohort w1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string").withColumn(
        "ts", F.to_timestamp("ts"))
    got = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in event_retention_cohorts(df).collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1}
