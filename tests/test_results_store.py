"""Results warehouse (DOMS D5 analog): save a matchup execution, re-read it
by id, and check the stats summary."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_save_load_execution_roundtrip(spark, tmp_path):
    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup
    from nexus_spark.operators.results_store import (execution_stats,
                                                     load_execution,
                                                     save_execution)

    p = domain.matchup_primary(spark, SF_DIR)
    s = domain.matchup_secondary(spark, SF_DIR)
    results = matchup(p, s, radius_km=300.0, time_tolerance_s=86400.0)
    n = results.count()

    wh = str(tmp_path / "warehouse")
    params = {"rt_km": 300.0, "tt_s": 86400, "primary": "events_even"}
    eid = save_execution(results, params, wh)

    loaded, meta = load_execution(spark, wh, eid)
    assert loaded.count() == n
    assert meta["params"] == params
    assert meta["execution_id"] == eid

    stats = execution_stats(loaded).collect()[0]
    assert stats["n_matches"] == n
    if n:
        assert stats["max_dist_km"] <= 300.0
