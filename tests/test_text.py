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
