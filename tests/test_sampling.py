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


def test_cluster_representatives_rollup(spark):
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    comps = connected_components(pairs, nodes)
    stats = {r.component: (r.cluster_size, r.n_duplicates)
             for r in cluster_representatives(comps).collect()}
    assert stats == {1: (3, 2), 7: (1, 0)}
