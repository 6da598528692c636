from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("NEXUS_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("NEXUS_SPARK_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from nexus_spark.session import get_session

    # 8 local cores: the suite grew past 9.5 min at local[4] (115-query
    # parity sweep); local[8] keeps it well inside any 10-min budget on
    # the 32-core container while leaving headroom for the bench.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_session("nexus_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR_T2}/{name}.parquet'")
    yield con
    con.close()


def assert_frames_match(spark_df, duck_rel, float_tol=1e-6):
    """Order-insensitive compare of a Spark DataFrame vs a DuckDB relation,
    mimicking the driver's check: column names sorted, values compared."""
    import math

    sdf = spark_df.toPandas()
    ddf = duck_rel.df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"columns differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
    cols = sorted(sdf.columns)
    sdf = sdf[cols]
    ddf = ddf[cols]
    assert len(sdf) == len(ddf), f"row counts differ: {len(sdf)} vs {len(ddf)}"

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        if isinstance(v, float):
            r = round(v, 6)
            if r == 0.0:
                r = 0.0  # collapse -0.0
            return f"{r:.6f}"
        return str(v)

    srows = sorted(tuple(norm(v) for v in row) for row in sdf.itertuples(index=False))
    drows = sorted(tuple(norm(v) for v in row) for row in ddf.itertuples(index=False))
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[:3]}"
