"""Curation pipeline semantics: quality gate, fingerprint dedup with
lowest-id survivor, copy counting, language filter."""

from __future__ import annotations


GOOD = ("the quick brown fox jumps over the lazy dog and then "
        "walks away to find some food for the long winter ahead")


def test_curate_gates_dedups_and_counts(spark):
    from nexus_spark.operators.text import curate

    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, GOOD),                      # exact duplicate of 1
            (3, "  " + GOOD + " "),         # normalized duplicate of 1
            (4, "too short"),               # fails the length band (q=2/3)
            (5, GOOD + " with one extra tail sentence to differ"),
        ],
        "doc_id long, text string")
    # min_quality=0.9 admits only perfect-score docs (quality is n/3)
    out = {r.doc_id: r for r in curate(docs, min_quality=0.9).collect()}
    assert set(out) == {1, 5}            # lowest id survives, 4 gated out
    assert out[1].dup_cnt == 3           # 1, 2 and the normalized 3
    assert out[5].dup_cnt == 1
    assert out[1].fingerprint != out[5].fingerprint


def test_curate_language_filter(spark):
    from nexus_spark.operators.text import curate

    docs = spark.createDataFrame(
        [(1, GOOD),
         (2, "el rapido zorro marron salta sobre el perro perezoso y luego "
             "se va caminando a buscar la comida para el largo invierno")],
        "doc_id long, text string")
    out = curate(docs, min_quality=0.0, langs=("en",)).collect()
    assert [r.doc_id for r in out] == [1]


def test_bpe_token_count_cross_engine_parity(spark):
    """The GPT-2-style pre-tokenizer pattern is a shared contract: the
    SAME pattern string must count identically under java.util.regex
    (Spark) and RE2 (DuckDB) across contractions, digits, unicode-ish
    punctuation, repeated spaces, and the empty string."""
    import duckdb
    from pyspark.sql import functions as F

    from nexus_spark.operators.text import (BPE_TOKEN_PATTERN,
                                            bpe_token_count)

    samples = [
        (1, "The quick brown fox doesn't jump over 42 lazy dogs!!!"),
        (2, "it's we're I'll they'd you've  double  space"),
        (3, "unicode: cafe numero 3.14, end."),
        (4, "a b c"),
        (5, ""),
    ]
    sdf = spark.createDataFrame(samples, ["i", "t"])
    got = {r["i"]: r["n"] for r in
           sdf.select("i", bpe_token_count(F.col("t")).alias("n"))
           .collect()}
    con = duckdb.connect()
    for i, t in samples:
        want = con.execute("SELECT len(regexp_extract_all(?, ?))",
                           [t, BPE_TOKEN_PATTERN]).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
    assert got[1] == 12 and got[4] == 3 and got[5] == 0


def test_distribution_drift_detects_planted_shift(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.text import distribution_drift

    mk = lambda texts: spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    short = ["w " * 5] * 40
    long_ = ["w " * 50] * 40
    a = mk(short + long_[:10])          # mostly short
    b = mk(short[:10] + long_)          # mostly long
    score = F.least(F.size(F.split(F.col("text"), " ")) / 10,
                    F.lit(9)).cast("int")
    shifted = distribution_drift(a, b, score).collect()
    psi_shift = shifted[0]["psi"]
    same = distribution_drift(a, a, score).collect()
    assert same[0]["psi"] < 1e-9          # identical corpora: PSI ~ 0
    assert psi_shift > 0.5                # planted shift: well past 0.1
    # fractions are proper distributions
    assert abs(sum(r["frac_a"] for r in shifted) - 1.0) < 1e-9
    assert abs(sum(r["frac_b"] for r in shifted) - 1.0) < 1e-9


def test_bigram_nll_hand_computed(spark):
    import math

    from nexus_spark.operators.text import bigram_nll

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string")
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1 -> p(b|a)=1, p(a|b)=1/4? no:
    # c(a,b)=3, c(b,a)=1, c(b,c)=1; contexts: c(a)=3, c(b)=2
    got = {r["doc_id"]: r for r in bigram_nll(docs).collect()}
    p_ab, p_ba, p_bc = 3 / 3, 1 / 2, 1 / 2
    want1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    want2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["nll"] - want1) < 1e-12
    assert abs(got[2]["nll"] - want2) < 1e-12
    assert 3 not in got  # single-token doc has no bigrams (contract)
    assert abs(got[2]["ppl"] - math.exp(want2)) < 1e-9


def test_vocab_oov_hand_computed(spark):
    from nexus_spark.operators.text import vocab_oov

    docs = spark.createDataFrame(
        [(1, "a a a b b rare1"), (2, "a b b c rare2 rare3")],
        "doc_id long, text string")
    # counts: a=4, b=4, c=1, rare1=1, rare2=1, rare3=1
    # vocab_size=2 -> {a, b} (count desc, word asc tie-break beats c)
    got = {r["doc_id"]: r for r in vocab_oov(docs, vocab_size=2).collect()}
    assert (got[1]["n_tokens_v"], got[1]["n_oov"]) == (6, 1)
    assert (got[2]["n_tokens_v"], got[2]["n_oov"]) == (6, 3)
    assert abs(got[2]["oov_rate"] - 0.5) < 1e-12


def test_corpus_diff_statuses(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.text import corpus_diff

    old = spark.createDataFrame(
        [(1, "a b c"), (2, "x y"), (3, "gone soon")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, "a  b   c"),   # whitespace-only change -> unchanged
         (2, "x y z"),      # content change -> changed
         (4, "brand new")], # added
        ["doc_id", "text"])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text(spark):
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)

    from nexus_spark.operators.text import corpus_diff

    schema = StructType([StructField("doc_id", IntegerType()),
                         StructField("text", StringType())])
    # doc 1: NULL old text but present in both -> changed (was wrongly
    # 'added' before NULL coalescing); doc 2: NULL both sides ->
    # unchanged; doc 3: NULL new text, present both -> changed.
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "kept")], schema)
    new = spark.createDataFrame(
        [(1, "filled in"), (2, None), (3, None)], schema)
    rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert {k: v["status"] for k, v in rows.items()} == {
        1: "changed", 2: "unchanged", 3: "changed"}
    # present-side fingerprints are never NULL (NULL fp means "absent")
    assert all(r["old_fp"] is not None and r["new_fp"] is not None
               for r in rows.values())


def test_importance_scores_directionality(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.text import importance_scores

    rows = [
        (0, "alpha alpha beta", "t"),
        (1, "alpha beta beta", "t"),
        (2, "gamma delta gamma", "x"),
        (3, "delta gamma delta", "x"),
        (4, "alpha alpha alpha", "x"),   # raw doc that LOOKS like target
        (5, "gamma gamma gamma", "t"),   # target doc that looks off-target
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    got = {r["doc_id"]: r["importance"]
           for r in importance_scores(docs, F.col("grp") == "t").collect()}
    # target-vocabulary docs score higher than off-target-vocabulary docs
    assert got[0] > got[2] and got[1] > got[3]
    # scoring is content-based, not label-based: the alpha-heavy RAW doc
    # outscores the delta-heavy raw docs (alpha is target-favored)
    assert got[4] > got[2] and got[4] > got[3]
    # beta is the most target-exclusive word -> doc 1 (beta-heavy) tops
    assert got[1] == max(got.values())


def test_language_segments_detects_code_switching(spark):
    from nexus_spark.operators.text import language_segments

    en = "the cat and the dog is in the house it is the best"
    es = "el gato y la de que los se en el de que se los"
    docs = spark.createDataFrame(
        [(0, en + " " + en),        # monolingual
         (1, en + " " + es),        # code-switched halves
         (2, es + " " + es)],
        ["doc_id", "text"])
    got = {r["id"]: r for r in
           language_segments(docs, chunk_tokens=13).collect()}
    assert got[0]["n_langs"] == 1 and got[0]["dom_lang"] == "en"
    assert got[0]["minority_frac"] == 0.0
    assert got[2]["n_langs"] == 1 and got[2]["dom_lang"] == "es"
    assert got[1]["n_langs"] == 2
    assert got[1]["minority_frac"] > 0.0


def test_zipf_profile_hand_computed(spark):
    from nexus_spark.operators.text import zipf_profile

    # corpus counts: a=4, b=2, c=1 -> ranks 1,2,3
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "a")], ["doc_id", "text"])
    rows = {r["rank"]: r for r in zipf_profile(docs, k=3).collect()}
    assert [(rows[i]["word"], rows[i]["freq"]) for i in (1, 2, 3)] == \
        [("a", 4), ("b", 2), ("c", 1)]
    # OLS slope of ln(freq) on ln(rank) over the 3 points
    import math
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
             / sum((x - mx) ** 2 for x in xs))
    assert abs(rows[1]["zipf_slope"] - slope) < 1e-9
    assert len({r["zipf_slope"] for r in rows.values()}) == 1


def test_pmi_bigrams_hand_computed(spark):
    import math

    from nexus_spark.operators.text import pmi_bigrams

    # "x y" always adjacent; "p"/"q" never adjacent to each other
    docs = spark.createDataFrame(
        [(i, "x y p") for i in range(5)] + [(10, "q p x y")],
        ["doc_id", "text"])
    rows = pmi_bigrams(docs, k=10, min_count=2).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    # bigram stream: 5x (x,y)+(y,p) + (q,p)+(p,x)+(x,y) -> n_b = 13
    # unigrams: x=6 y=6 p=6 q=1 -> n_u = 19
    assert got[("x", "y")]["pair_count"] == 6
    exp = math.log((6 / 13) / ((6 / 19) * (6 / 19)))
    assert abs(got[("x", "y")]["pmi"] - exp) < 1e-9
    # min_count prunes the single-occurrence pairs
    assert ("q", "p") not in got and ("p", "x") not in got
    # ranks are 1..n by pmi desc
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_learn_bpe_merges_matches_reference_algorithm(spark):
    """learn_bpe_merges must equal a pure-Python Sennrich-style BPE on a
    corpus exercising repeats ('aaaa' -> [aa, aa] under (a,a)),
    frequency weighting, and the lexicographic tie-break."""
    from nexus_spark.operators.text import learn_bpe_merges

    texts = ["low low low lower", "aaaa aaaa", "newer newer low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    def ref_bpe(corpus, n):
        wf = {}
        for t in corpus:
            for w in t.split(" "):
                if w:
                    wf[w] = wf.get(w, 0) + 1
        vocab = {w: [c for c in w] for w in wf}
        out = []
        for rank in range(1, n + 1):
            counts = {}
            for w, sym in vocab.items():
                for a, b in zip(sym, sym[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + wf[w]
            if not counts:
                break
            (l, r), c = min(counts.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            out.append((rank, l, r, c))
            for w, sym in vocab.items():
                new, i = [], 0
                while i < len(sym):
                    if (i + 1 < len(sym) and sym[i] == l
                            and sym[i + 1] == r):
                        new.append(l + r)
                        i += 2
                    else:
                        new.append(sym[i])
                        i += 1
                vocab[w] = new
        return out

    want = ref_bpe(texts, 5)
    got = learn_bpe_merges(docs, n_merges=5)
    assert got == want, (got, want)
    # sanity on the fixture itself: (a,a) wins round 1 — 'aaaa' x2 has
    # 3 overlapping (a,a) positions each -> count 6, beating 'lo' at 5;
    # round 2 must count pairs over the MERGED [aa,aa] symbols
    assert got[0] == (1, "a", "a", 6)
    assert got[1] == (2, "l", "o", 5)
    assert (5, "aa", "aa", 2) in got  # round 5 counts the MERGED symbols

    import pytest
    with pytest.raises(ValueError, match="positive"):
        learn_bpe_merges(docs, n_merges=0)


def test_bpe_apply_counts_hand_computed(spark):
    from nexus_spark.operators.text import (bpe_apply_counts,
                                            learn_bpe_merges)

    docs = spark.createDataFrame(
        [(1, "low low"), (2, "lower"), (3, "aaaa")], ["doc_id", "text"])
    merges = learn_bpe_merges(docs, n_merges=2)
    # pair counts: (l,o)=3 (o,w)=3 (a,a)=3 (w,e)=1 (e,r)=1 ->
    # round 1 tie-break picks (a,a); round 2 picks (l,o)
    assert [(m[1], m[2]) for m in merges] == [("a", "a"), ("l", "o")]
    got = {r["id"]: (r["n_words"], r["n_tokens_bpe"])
           for r in bpe_apply_counts(docs, merges).collect()}
    # 'low' -> [lo, w] (2); 'lower' -> [lo, w, e, r] (4);
    # 'aaaa' -> [aa, aa] (2)
    assert got == {1: (2, 4), 2: (1, 4), 3: (1, 2)}
    # no merges: pure char counts
    got0 = {r["id"]: r["n_tokens_bpe"]
            for r in bpe_apply_counts(docs, []).collect()}
    assert got0 == {1: 6, 2: 5, 3: 4}


def test_gopher_quality_rule_semantics(spark):
    from nexus_spark.operators.text import gopher_quality

    good = " ".join(["the quick brown fox jumps over that lazy dog of"] * 6)
    docs = spark.createDataFrame(
        [
            (0, good),                                   # passes everything
            (1, "too short to keep"),                    # word-count fail
            (2, good + "\ndup line\ndup line\ndup line"),  # dup-line fails
            (3, good + " " + "# " * 20),                 # symbol-ratio fail
            (4, good + "\n- b1\n- b2\n* b3\nend..."),    # bullets+ellipsis
        ],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert rows[0]["rules_failed"] == 0 and rows[0]["keep"] == 1
    assert rows[1]["n_words"] < 50 and rows[1]["keep"] == 0
    assert rows[2]["dup_line_frac"] == 0.75 and rows[2]["keep"] == 0
    # 3 identical 8-char lines out of 4 lines; chars incl the base line
    assert rows[2]["dup_char_frac"] > 0.04
    assert rows[3]["symbol_ratio"] > 0.1 and rows[3]["keep"] == 0
    assert rows[4]["bullet_frac"] == 0.6  # 3 bullet lines of 5
    assert rows[4]["ellipsis_frac"] == 0.2
    # bullet_frac <= 0.9 passes, ellipsis 0.2 <= 0.3 passes, but mean
    # word len of '- b1' style lines drags nothing below 3.0: still keep
    assert rows[4]["stop_hits"] >= 2


def test_gopher_quality_null_and_empty_are_rejected_not_null(spark):
    from nexus_spark.operators.text import gopher_quality

    docs = spark.createDataFrame([(0, None), (1, "")],
                                 "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    for i in (0, 1):
        assert rows[i]["keep"] == 0          # rejected, not NULL
        assert rows[i]["rules_failed"] >= 1  # word-count rule fails
        assert rows[i]["n_words"] <= 1


def test_hash_embed_unit_norm_and_duplicate_cosine(spark):
    from pyspark.sql import functions as F

    from nexus_spark.operators.text import hash_embed

    docs = spark.createDataFrame(
        [(0, "spark joins shuffle data fast"),
         (1, "spark joins shuffle data fast"),      # exact duplicate of 0
         (2, "completely different words entirely here")],
        "doc_id long, text string")
    emb = hash_embed(docs)
    # per-doc L2 norm is 1 (normalized sparse vector)
    norms = {r["doc_id"]: r["n"] for r in
             emb.groupBy("doc_id")
             .agg(F.sum(F.col("val") * F.col("val")).alias("n")).collect()}
    for v in norms.values():
        assert abs(v - 1.0) < 1e-12
    # identical docs get identical sparse vectors -> cosine exactly 1
    a = {(r["pos"]): r["val"] for r in
         emb.where(F.col("doc_id") == 0).collect()}
    b = {(r["pos"]): r["val"] for r in
         emb.where(F.col("doc_id") == 1).collect()}
    assert a == b
    c = {(r["pos"]): r["val"] for r in
         emb.where(F.col("doc_id") == 2).collect()}
    dot_ac = sum(a[p] * c[p] for p in set(a) & set(c))
    assert dot_ac < 0.9  # different content does not collide to cosine 1


def test_quality_funnel_stages_are_monotone_and_counted(spark):
    """Funnel gates are CUMULATIVE: each stage's pass count can never
    exceed the previous one; hand-built docs land in known stages."""
    from nexus_spark.operators.text import quality_funnel

    good = "the quick brown fox and the lazy dog " * 10  # 80 words
    rows = [
        (1, "s", good),                      # passes all four gates
        (2, "s", "short text"),              # fails word count
        (3, "s", " ".join(["x" * 40] * 60)),  # words ok, mean_wl fails
        (4, "s", " ".join(["12345"] * 60)),  # alpha fails (no letters)
        (5, "s", " ".join(["fox", "dog"] * 30)),  # no stopword hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = quality_funnel(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_docs == 5
    assert (r.pass_words, r.pass_word_len, r.pass_alpha,
            r.pass_stopwords) == (4, 3, 2, 1)
    assert r.pass_words >= r.pass_word_len >= r.pass_alpha >= r.pass_stopwords
    assert abs(r.retention - 0.2) < 1e-12
