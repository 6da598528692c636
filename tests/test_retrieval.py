"""Hand-computed unit tests for the retrieval operators (BM25, RRF
hybrid), the NB classifier, shard export, and int8 quantization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "spark join join window fast"),
        (1, "spark scan scan scan scan scan scan scan"),
        (2, "slow merge batch"),
        (3, "join window window"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_hand_computed(tiny_docs):
    from nexus_spark.operators.retrieval import bm25_scores

    got = {r["doc_id"]: r for r in
           bm25_scores(tiny_docs, ("spark", "join")).collect()}
    # corpus: N=4, dl = [5, 8, 3, 3], avgdl = 19/4 = 4.75
    # df(spark)=2, df(join)=2 -> idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    n, avgdl, k1, b = 4, 4.75, 1.2, 0.75
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def term(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(got) == {0, 1, 3}  # doc 2 matches neither term
    assert got[0]["n_terms_hit"] == 2
    assert got[0]["bm25"] == pytest.approx(term(1, 5) + term(2, 5), rel=1e-12)
    assert got[1]["n_terms_hit"] == 1
    assert got[1]["bm25"] == pytest.approx(term(1, 8), rel=1e-12)
    assert got[3]["bm25"] == pytest.approx(term(1, 3), rel=1e-12)


def test_bm25_topk_rank_deterministic(tiny_docs):
    from nexus_spark.operators.retrieval import bm25_topk

    top = bm25_topk(tiny_docs, ("spark", "join"), k=2).collect()
    assert [r["lex_rank"] for r in top] == [1, 2]
    # doc 0 hits both terms with higher tf -> rank 1
    assert top[0]["doc_id"] == 0


def test_bm25_topk_plans_take_ordered(tiny_docs):
    """The k-selection must be TakeOrderedAndProject (per-partition heaps),
    never a global single-partition sort of the score table."""
    from nexus_spark.operators.retrieval import bm25_topk

    plan = bm25_topk(tiny_docs, ("spark", "join"), k=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hybrid_rrf_fuses_both_lists(spark, tiny_docs):
    from nexus_spark.operators.retrieval import hybrid_rrf

    dim = 4
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = hybrid_rrf(tiny_docs, emb, ("spark", "join"), query_vec_id=0,
                     k=4, depth=3, dim=dim).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 1: lexical rank 3 (one weak term) AND vector rank 1 (cos ~ .994)
    assert by_id[1]["vec_rank"] == 1
    assert by_id[1]["rrf_score"] == pytest.approx(
        1 / (60 + by_id[1]["lex_rank"]) + 1 / 61, rel=1e-12)
    # doc 0 is the query vector itself: excluded from its own knn list,
    # so it fuses from the lexical list alone
    assert by_id[0]["vec_rank"] is None
    assert by_id[0]["lex_rank"] == 1
    # every rrf score = sum of its two contributions
    for r in out:
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1 / (60 + r["lex_rank"])
        if r["vec_rank"] is not None:
            want += 1 / (60 + r["vec_rank"])
        assert r["rrf_score"] == pytest.approx(want, rel=1e-12)


def test_nb_classifier_separable(spark):
    from nexus_spark.operators.text import nb_lang_classifier

    rows = [
        (0, "the cat sat", "en"),
        (1, "the dog ran", "en"),
        (2, "el gato aqui", "es"),
        (3, "el perro alla", "es"),
        # held-in docs dominated by one class's vocabulary
        (4, "the the cat dog", "en"),
        (5, "el el gato perro", "es"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r["doc_id"]: r for r in nb_lang_classifier(docs).collect()}
    assert len(got) == 6
    for i in (0, 1, 4):
        assert got[i]["lang_pred"] == "en", got[i]
    for i in (2, 3, 5):
        assert got[i]["lang_pred"] == "es", got[i]
    # hand-check doc 4's winning logpost: priors 3/6 each;
    # en tokens: the,cat,sat,the,dog,ran,the,the,cat,dog = 10
    # vocab = {the,cat,sat,dog,ran,el,gato,aqui,perro,alla} = 10
    # p(the|en)=(4+1)/(10+10), p(cat|en)=3/20, p(dog|en)=3/20
    # doc4 = the the cat dog -> ln prior + 2*ln p(the) + ln p(cat) + ln p(dog)
    want = (math.log(0.5) + 2 * math.log(5 / 20)
            + math.log(3 / 20) + math.log(3 / 20))
    assert got[4]["logpost"] == pytest.approx(want, rel=1e-12)


def test_shuffle_shards_contract(spark):
    from nexus_spark.operators.sampling import shuffle_shards

    docs = spark.range(200).select(F.col("id").alias("doc_id"),
                                   F.lit("x").alias("text"))
    out = shuffle_shards(docs, n_shards=4, seed="s").collect()
    assert len(out) == 200
    shards = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        shards.setdefault(r["shard"], []).append(r["pos_in_shard"])
    # positions are contiguous 1..n within each shard
    for positions in shards.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # roughly balanced (binomial: 50 +- ~20)
    assert all(20 <= len(p) <= 85 for p in shards.values())
    # deterministic under repartitioning
    again = shuffle_shards(docs.repartition(7), n_shards=4, seed="s").collect()
    assert {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in again} \
        == {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in out}
    # a different seed is a different permutation
    reseeded = shuffle_shards(docs, n_shards=4, seed="t").collect()
    assert {(r["doc_id"], r["shard"]) for r in reseeded} \
        != {(r["doc_id"], r["shard"]) for r in out}


def test_quantize_int8_hand_computed(spark):
    from nexus_spark.operators.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(0, [1.27, -1.27, 0.635, 0.0]),
         (1, [0.0, 0.0, 0.0, 0.0])],  # zero vector -> scale 0, codes 0
        ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    r0 = got[0]
    # scale = 1.27/127 = 0.01; codes = [127, -127, 64 (63.5 rounds up), 0]
    assert r0["scale"] == pytest.approx(0.01, rel=1e-9)
    assert r0["qmax"] == 127 and r0["qmin"] == -127
    assert r0["qsum"] == 127 - 127 + 64 + 0
    # mse = ((0.635 - 64*0.01)^2) / 4 = (0.005)^2/4 (floats are inexact;
    # loose tolerance)
    assert r0["mse"] == pytest.approx(0.005 ** 2 / 4, rel=1e-6)
    r1 = got[1]
    assert r1["scale"] == 0.0 and r1["qsum"] == 0 and r1["mse"] == 0.0


def test_bm25_repeated_query_term_weights(tiny_docs):
    from nexus_spark.operators.retrieval import bm25_scores

    import pytest

    once = {r["doc_id"]: r["bm25"]
            for r in bm25_scores(tiny_docs, ("spark", "join")).collect()}
    twice = {r["doc_id"]: r["bm25"]
             for r in bm25_scores(tiny_docs,
                                  ("spark", "spark", "join")).collect()}
    # doubling 'spark' doubles its per-term contribution only
    one = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(tiny_docs, ("spark",)).collect()}
    for d in once:
        extra = one.get(d, 0.0)
        assert twice[d] == pytest.approx(once[d] + extra, rel=1e-12)
    with pytest.raises(ValueError):
        bm25_scores(tiny_docs, ("",))


def test_bm25_index_memo_hits_and_isolates_corpora(spark, tiny_docs):
    """The postings+stats index memoizes per (session, corpus plan):
    a repeat call returns the SAME cached frames (no rebuild), while a
    different corpus gets its own index — scores never cross over."""
    from nexus_spark.operators.retrieval import (bm25_index_cached,
                                                 bm25_scores)

    p1, s1 = bm25_index_cached(tiny_docs)
    p2, s2 = bm25_index_cached(tiny_docs)
    assert p1 is p2 and s1 is s2  # cache hit, no rebuild

    other = spark.createDataFrame(
        [(0, "spark spark spark"), (1, "merge")], ["doc_id", "text"])
    p3, _ = bm25_index_cached(other)
    assert p3 is not p1
    # df('spark') reflects each corpus independently
    df1 = {r["word"]: 1 for r in p1.where("word = 'spark'")
           .select("word").distinct().collect()}
    assert df1 == {"spark": 1}
    got_other = {r["doc_id"]: r["n_terms_hit"]
                 for r in bm25_scores(other, ("spark",)).collect()}
    assert got_other == {0: 1}


def test_domain_invalidate_drops_all_session_memos(spark, tiny_docs):
    """domain.invalidate() must drop EVERY operator-level session memo —
    BM25 postings, text stats, LSH buckets, IVF layout, MMR pool — not
    just the dedup/similarity flat caches (round-9 ADVICE: a lake
    rewrite otherwise serves pre-rewrite postings/stats/buckets because
    a same-path re-read sameSemantics-hits the old plan)."""
    from nexus_spark import domain
    from nexus_spark.catalog import load_table
    from nexus_spark.operators import retrieval, similarity, text
    from nexus_spark.operators.retrieval import bm25_index_cached
    from nexus_spark.operators.text import text_stats

    from nexus_spark.operators import graph
    from nexus_spark.operators.text import hash_embed_cached

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.where("vec_id < 3")
    bm25_index_cached(tiny_docs)
    text_stats(tiny_docs)
    hash_embed_cached(tiny_docs).count()
    similarity.ann_lsh(emb, queries, k=3).count()
    flat = similarity._flat_cached(emb, "vec_id", "embedding",
                                   similarity.DIM, "c")
    similarity.ivf_layout_cached(flat, similarity.DIM, 16).count()
    similarity.ivf_max_cell_cached(flat, similarity.DIM, 16, 2)
    graph._checkpointed(
        emb.limit(2), "test-edges",
        lambda: emb.limit(2).selectExpr("vec_id AS src",
                                        "vec_id + 1 AS dst"))
    assert retrieval._BM25_IDX_CACHE and text._STATS_CACHE
    assert text._HASH_EMBED_CACHE and graph._EDGE_CACHE
    assert similarity._LSH_BUCKETS_CACHE and similarity._LAYOUT_CACHE
    assert similarity._CELL_MAX_CACHE
    domain.invalidate()
    assert not retrieval._BM25_IDX_CACHE
    assert not text._STATS_CACHE
    assert not text._HASH_EMBED_CACHE
    assert not text._NB_FIT_CACHE
    assert not graph._EDGE_CACHE
    assert not similarity._LSH_BUCKETS_CACHE
    assert not similarity._LAYOUT_CACHE
    assert not similarity._MMR_POOL_CACHE
    assert not similarity._CELL_MAX_CACHE


def test_bm25_index_streaming_corpus_builds_uncached_plan(spark, tmp_path):
    """A streaming corpus skips memoization instead of failing at
    .cache() analysis (round-9 ADVICE; mirrors the text_stats guard)."""
    from nexus_spark.operators.retrieval import bm25_index_cached

    src = str(tmp_path / "docs")
    spark.createDataFrame([(0, "spark joins fast")],
                          ["doc_id", "text"]).write.parquet(src)
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .parquet(src))
    postings, stats = bm25_index_cached(stream)
    assert postings.isStreaming
    from nexus_spark.operators.retrieval import _BM25_IDX_CACHE
    assert all(not d.isStreaming for d, _, _ in _BM25_IDX_CACHE.values())
