"""Corpus-scrubbing semantics: PII detection/redaction, within-doc
repetition, cross-doc exact-substring span marking (boundary exactness and
island merging — properties the oracle-parity hash can't localize)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_counts_and_redaction(spark):
    from nexus_spark.operators.scrub import pii_stats, redact_pii

    docs = spark.createDataFrame(
        [(1, "mail a.b-c@x-corp.io or root@h.org, host 10.0.255.7 "
             "tel +4915123456789"),
         (2, "no pii here, just 1.2 numbers and an @ sign"),
         (3, "ip 192.168.0.1 and ip 8.8.8.8")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) \
        == (2, 1, 1)
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_phones"]) \
        == (0, 0, 0)
    assert (got[3]["n_emails"], got[3]["n_ipv4"], got[3]["n_phones"]) \
        == (0, 2, 0)

    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert red[1] == ("mail <EMAIL> or <EMAIL>, host <IP> tel <PHONE>")
    assert red[2] == "no pii here, just 1.2 numbers and an @ sign"
    assert red[3] == "ip <IP> and ip <IP>"


def test_repetition_ratio(spark):
    from nexus_spark.operators.scrub import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"),   # 7 3-grams, 3 distinct
         (2, "all words here differ totally"),
         (3, "tiny")],               # shorter than n -> one whole-text gram
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=3).collect()}
    assert (got[1]["n_grams"], got[1]["n_distinct"]) == (7, 3)
    assert abs(got[1]["rep_ratio"] - (1 - 3 / 7)) < 1e-12
    assert got[2]["rep_ratio"] == 0.0
    assert (got[3]["n_grams"], got[3]["n_distinct"]) == (1, 1)


def test_span_marks_boundaries_and_merge(spark):
    from nexus_spark.operators.scrub import span_dedup_marks

    # docs 1 and 2 share tokens 2..11 of doc 1 (a 10-token run); with
    # window=8 that is windows at positions 2,3,4 in doc 1 -> ONE merged
    # span [2, 11]. doc 3 shares nothing.
    shared = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"
    docs = spark.createDataFrame(
        [(1, "u1 u2 " + shared + " u3 u4"),
         (2, "v1 " + shared + " v2 v3 v4"),
         (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")],
        ["doc_id", "text"])
    got = {(r["id"], r["span_start"], r["span_end"]): r["n_windows"]
           for r in span_dedup_marks(docs, window=8).collect()}
    assert got == {(1, 2, 11): 3, (2, 1, 10): 3}


def test_apply_span_dedup_cuts_exact_spans(spark):
    from nexus_spark.operators.scrub import (apply_span_dedup,
                                             span_dedup_marks)

    shared = "s0 s1 s2 s3 s4 s5 s6 s7"
    docs = spark.createDataFrame(
        [(1, f"k1 k2 {shared} k3"),
         (2, f"{shared} k4 k5"),
         (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9")],
        ["doc_id", "text"])
    marks = span_dedup_marks(docs, window=8)
    got = {r["doc_id"]: r
           for r in apply_span_dedup(docs, marks).collect()}
    assert got[1]["text"] == "k1 k2 k3"
    assert (got[1]["n_tokens_kept"], got[1]["n_tokens_cut"]) == (3, 8)
    assert got[2]["text"] == "k4 k5"
    assert got[3]["text"] == "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    assert got[3]["n_tokens_cut"] == 0


def test_span_marks_distinct_islands(spark):
    from nexus_spark.operators.scrub import span_dedup_marks

    # two disjoint shared runs in one doc -> two separate spans
    run_a = "a0 a1 a2 a3 a4 a5 a6 a7"
    run_b = "b0 b1 b2 b3 b4 b5 b6 b7"
    gap = "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"
    docs = spark.createDataFrame(
        [(1, f"{run_a} {gap} {run_b}"),
         (2, run_a),
         (3, run_b)],
        ["doc_id", "text"])
    spans = {(r["id"], r["span_start"], r["span_end"])
             for r in span_dedup_marks(docs, window=8).collect()}
    assert (1, 0, 7) in spans and (1, 18, 25) in spans
    assert (2, 0, 7) in spans and (3, 0, 7) in spans
    assert len(spans) == 4


def test_cross_contamination_spans_planted_leak(spark):
    from nexus_spark.operators.scrub import cross_contamination_spans

    leak = "q w e r t y u i"  # 8 tokens == window
    train = spark.createDataFrame(
        [(1, "a b c " + leak + " d e f"),   # leaked span at tokens 3..10
         (2, "clean doc with no benchmark overlap at all here ok")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "benchmark text holds " + leak + " somewhere inside")],
        ["doc_id", "text"])
    got = cross_contamination_spans(train, bench, window=8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id"], r["span_start"], r["span_end"]) == (1, 3, 10)
    # benchmark docs themselves are never marked; disjoint train doc clean
    assert all(row["id"] != 2 for row in got)


def test_window_hash_memo_discipline(spark):
    """The window-hash postings memo (round 13) follows the session-memo
    contract: repeated calls on the same plan return ONE cached frame,
    distinct hash families get distinct entries, and clear_cache /
    domain.invalidate empty it."""
    from nexus_spark import domain
    from nexus_spark.operators import scrub

    docs = spark.createDataFrame(
        [(1, "m0 m1 m2 m3 m4 m5 m6 m7 m8"),
         (2, "m0 m1 m2 m3 m4 m5 m6 m7 n9")],
        ["doc_id", "text"])
    scrub.clear_cache()
    a = scrub._window_hashes(docs, 8, "doc_id", "text", "xxhash64")
    b = scrub._window_hashes(docs, 8, "doc_id", "text", "xxhash64")
    assert a is b and a.storageLevel.useMemory
    m = scrub._window_hashes(docs, 8, "doc_id", "text", "md5")
    assert m is not a
    assert len(scrub._WINHASH_CACHE) == 2
    # the memoized stream still carries the right contents
    assert a.count() == 4  # two docs, windows at pos 0 and 1 each
    domain.invalidate()
    assert not scrub._WINHASH_CACHE
