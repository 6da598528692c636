"""Driver-style parity check: every queries() entry vs its oracle_sql() via
DuckDB at sf0.01 (the t2 gate). Order-insensitive, column-name-sorted,
6-decimal float compare — mirrors CORRECTNESS_r{N}.json methodology."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_T2, assert_frames_match


def _entry_module():
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    return importlib.import_module("__spark_entry__")


def _query_names():
    return sorted(_entry_module().queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    mod = _entry_module()
    q = mod.queries()[name]
    sql = mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR_T2)
    if sql is None:
        # rows-only check for non-SQL-expressible ops
        assert sdf.count() >= 0
        return
    assert_frames_match(sdf, duck.sql(sql))


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_lowpass_checked_matches_oracle_with_null_days(spark):
    """sf0.001's daily series has ~36 NULL days inside the pinned 365-day
    window (sf0.01 has none), so this is the only gate on the
    null-interpolation leg of the f_lowpass_checked oracle — and a
    regression pin on two bit-exactness requirements the round-6 debug
    established: np.interp's exact op order in the fill CTE, and
    QUOTED-string double literals (a bare numeric inside CAST(x AS
    DOUBLE) parses as DECIMAL first and loses the ulp that the order-9
    transient amplifies ~1e7x)."""
    import duckdb

    from tests.conftest import SF_DIR, assert_frames_match

    mod = _entry_module()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")
    sdf = mod.queries()["f_lowpass_checked"](spark, SF_DIR)
    assert_frames_match(sdf, con.sql(mod.oracle_sql()["f_lowpass_checked"]))
