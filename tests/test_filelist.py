"""Granule file-discovery semantics (sources/filelist.py — the in-scope
re-expression of the reference's misnamed clim/wls.py file walker):
match-any regex/wildcard, s/pat/subst/ rewriting, info rows, atomic
fetch staging, and the DataFrame hand-off."""

import os

import pytest


@pytest.fixture()
def tree(tmp_path):
    for rel in ("a/sst_2020.nc", "a/sst_2021.nc", "a/chl_2020.nc",
                "b/deep/sst_2022.nc", "b/readme.txt"):
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x" * (10 + len(rel)))
    return tmp_path


def _names(hits):
    return sorted(os.path.basename(h[0]) for h in hits)


def test_match_any_regex_or_wildcard(tree):
    from nexus_spark.sources.filelist import list_files

    assert _names(list_files(str(tree), regexes=[r"^sst_.*\.nc$"])) == \
        ["sst_2020.nc", "sst_2021.nc", "sst_2022.nc"]
    assert _names(list_files(str(tree), wildcards=["chl_*"])) == \
        ["chl_2020.nc"]
    # ANY-of across both families; no patterns -> everything
    assert _names(list_files(str(tree), regexes=[r"readme"],
                             wildcards=["chl_*"])) == \
        ["chl_2020.nc", "readme.txt"]
    assert len(list(list_files(str(tree)))) == 5


def test_subst_rewrite_and_constraint(tree):
    from nexus_spark.sources.filelist import list_files

    hits = list(list_files(str(tree), regexes=[r"s/\.nc$/.parquet/"]))
    assert all(h[1].endswith(".parquet") for h in hits)
    assert len(hits) == 4
    hits = list(list_files(str(tree), regexes=[r"\.nc$"],
                           constraint=lambda n: "2020" in n))
    assert _names(hits) == ["chl_2020.nc", "sst_2020.nc"]


def test_directories_info_and_path_match(tree):
    from nexus_spark.sources.filelist import list_files

    dirs = _names(list_files(str(tree), directories=True))
    assert dirs == ["a", "b", "deep"]
    rows = list(list_files(str(tree), regexes=[r"readme"],
                           with_info=True))
    assert len(rows) == 1 and rows[0][2] == 10 + len("b/readme.txt")
    deep = list(list_files(str(tree), regexes=[r"b/deep/"],
                           match_path=True))
    assert _names(deep) == ["sst_2022.nc"]


def test_fetch_stages_atomically(tree, tmp_path):
    from nexus_spark.sources.filelist import list_files

    dest = tmp_path / "staged"
    dest.mkdir()
    got = list(list_files(str(tree), regexes=[r"s/^sst_/fetched_/"],
                          fetch_dir=str(dest)))
    assert sorted(os.path.basename(p) for p, _ in got) == \
        ["fetched_2020.nc", "fetched_2021.nc", "fetched_2022.nc"]
    assert all(os.path.dirname(p) == str(dest) for p, _ in got)
    # bytes survived the copy+rename
    assert (dest / "fetched_2022.nc").read_bytes() == \
        b"x" * (10 + len("b/deep/sst_2022.nc"))


def test_remote_urls_out_of_scope(tree):
    from nexus_spark.sources.filelist import list_files

    with pytest.raises(NotImplementedError):
        list(list_files("ftp://example.org/granules"))


def test_files_df_handoff(tree, spark):
    from nexus_spark.sources.filelist import files_df

    df = files_df(spark, str(tree), regexes=[r"^sst_"])
    assert [f.name for f in df.schema.fields] == \
        ["path", "name", "size", "mtime"]
    rows = df.orderBy("path").collect()
    assert len(rows) == 3 and all(r["size"] > 0 for r in rows)
