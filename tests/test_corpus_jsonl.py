"""JSONL corpus interchange: exact round-trip fidelity and dirty-line
quarantine (sources/corpus.py)."""
import gzip
import os

from nexus_spark.sources.corpus import (CORRUPT_COL, clean, is_corrupt,
                                        read_jsonl, write_jsonl_shards)

HOSTILE = [
    (1, 'line\nbreak and "quotes"', "en", "src0", 23),
    (2, "tab\there \\ backslash", "en", "src0", 20),
    (3, "unicode é中文 \U0001f600", "zh", "src1", 10),
    (4, None, None, "src1", 0),  # null text/lang survive as nulls
    (5, "{looks: like json}", "en", "src2", 18),
]
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_jsonl_roundtrip_is_exact(spark, tmp_path):
    df = spark.createDataFrame(HOSTILE, COLS)
    path = str(tmp_path / "docs")
    write_jsonl_shards(df, path, n_shards=3)
    # gzip shards, as many as requested
    parts = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert len(parts) == 3
    back = clean(read_jsonl(spark, path))
    assert back.columns == COLS
    got = {tuple(r) for r in back.collect()}
    assert got == set(HOSTILE)


def test_jsonl_quarantines_dirty_lines(spark, tmp_path):
    df = spark.createDataFrame(HOSTILE, COLS)
    path = str(tmp_path / "docs")
    write_jsonl_shards(df, path, n_shards=1, compression="none")
    with open(f"{path}/dirty.json", "w") as f:
        f.write('{"doc_id": 99, "text": "truncated\n')
        f.write("not json at all\n")
    # cache: Spark disallows queries over raw JSON that reference ONLY
    # the internal corrupt-record column (see corpus.py docstring)
    full = read_jsonl(spark, path).cache()
    bad = full.where(is_corrupt(full))
    assert bad.count() == 2
    # quarantined rows keep the raw line for forensics, data cols NULL
    raws = {r[CORRUPT_COL] for r in bad.collect()}
    assert "not json at all" in raws
    assert {r["doc_id"] for r in bad.collect()} == {None}
    assert clean(full).count() == len(HOSTILE)
