"""Physical-plan assertions: the properties that make these plans survive a
100x scale-up, checked on the real optimized plans (not by eyeball).

- filters reach the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema)
- dimension joins broadcast; fact-fact joins do not broadcast the big side
- the matchup join never degenerates to a cartesian product and never
  broadcasts the exploded side
- single-pass aggregations have exactly one shuffle
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR_T2


def _plan(spark, name: str) -> str:
    """Final adaptive plan: execute (so AQE finalizes join strategies) and
    return the formatted explain, which includes scan details."""
    import __spark_entry__ as mod

    df = mod.queries()[name](spark, SF_DIR_T2)
    df.collect()  # count() would be a DIFFERENT plan; execute this one
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(jmode)


def _final_tree(plan: str) -> str:
    """The Final Plan tree section of an executed AQE formatted explain
    (node details for all nodes follow the Initial Plan tree, so only the
    tree is sliced, not the whole text)."""
    if "== Final Plan ==" in plan:
        return plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    return plan


def _optimized(spark, name: str) -> str:
    import __spark_entry__ as mod

    df = mod.queries()[name](spark, SF_DIR_T2)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_time_filter_pushed_to_scan(spark):
    """The time-range predicate must reach the lineitem scan as a pushed
    filter on l_shipdate (Catalyst pushes through the alias chain). Uses
    the UNCACHED derivation — the cached observations view (what queries()
    serves) intentionally scans memory instead of parquet."""
    from nexus_spark import domain
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.timeseries import time_series

    # Spark's cache manager matches by LOGICAL PLAN, so the exact
    # observations derivation would hit the session-cached view regardless
    # of how it is rebuilt; a no-op predicate makes the plan distinct and
    # forces a real parquet scan.
    load_table(spark, SF_DIR_T2, "lineitem").createOrReplaceTempView("lineitem")
    sql = domain.OBSERVATIONS_SQL + " WHERE l_linenumber >= 0"
    obs = spark.sql(sql)
    df = time_series(obs, datasets=["sst_a"], start_time="1996-01-01",
                     end_time="1996-12-31")
    df.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters section in scan"
    assert "l_shipdate" in m.group(1), m.group(1)


def test_column_pruning_reaches_scan(spark):
    """Q1 touches 7 lineitem columns; the scan must not read the rest."""
    plan = _plan(spark, "sql_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in scan"
    cols = m.group(1)
    assert "l_partkey" not in cols and "l_orderkey" not in cols, cols
    assert "l_quantity" in cols and "l_discount" in cols


def test_dimension_joins_broadcast(spark):
    """Q5: region/nation/customer/supplier sides broadcast; no shuffle join
    against a dimension table."""
    plan = _plan(spark, "sql_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:500]
    assert "CartesianProduct" not in plan


def test_matchup_never_cartesian_never_broadcasts_exploded_side(spark):
    plan = _plan(spark, "s8_matchup_once")
    assert "CartesianProduct" not in plan
    # The cell join builds its hash table on the compact SECONDARY side:
    # broadcast when its size estimate fits the budget (r13 — the
    # exploded primary then never shuffles), shuffled hash otherwise.
    # Either way a BroadcastExchange above the Generate (explode) would
    # mean Spark is broadcasting the ~45x-exploded primary.
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    bcast_sections = plan.split("BroadcastExchange")[1:]
    for section in bcast_sections:
        head = section[:800]
        assert "Generate explode" not in head, "exploded side broadcast!"


def test_matchup_over_budget_secondary_takes_shuffled_hash(spark,
                                                           monkeypatch):
    """The broadcast path is size-guarded: with a zero budget (stand-in
    for a fact-scale secondary whose estimate exceeds any budget) the
    cell join must fall back to the shuffled hash join, never broadcast,
    never sort-merge (no sort over the exploded side)."""
    monkeypatch.setenv("NEXUS_SPARK_MATCHUP_BROADCAST_MB", "0")
    plan = _plan(spark, "s8_matchup_once")
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    bcast_sections = plan.split("BroadcastExchange")[1:]
    for section in bcast_sections:
        assert "Generate explode" not in section[:800]


def test_single_shuffle_for_simple_groupby(spark):
    """s2 (groupBy lat,lon over one dataset) is scan -> partial agg ->
    exchange -> final agg: exactly one shuffle."""
    plan = _plan(spark, "s2_time_avg_map")
    assert _final_tree(plan).count("Exchange") == 1, _final_tree(plan)


def test_whole_stage_codegen_covers_aggregation(spark):
    """Simple-mode explain marks codegen stages with '*(n)' — the scan,
    filter, and partial aggregate must all be inside codegen."""
    import __spark_entry__ as mod

    df = mod.queries()["s1_time_series"](spark, SF_DIR_T2)
    df.collect()
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in simple, simple[:800]


def test_asof_join_is_broadcast_not_range(spark):
    """s7's climatology as-of must be a broadcast hash join on the pixel
    key (interval expansion), not a broadcast nested loop / range join."""
    plan = _plan(spark, "s7_daily_difference")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equi_join_on_bins(spark):
    """t_range_join must execute as a hash equi-join on (key, bin) with
    the exact range test riding the join — never a nested-loop /
    cartesian range join, and the error filter must reach the scan."""
    plan = _plan(spark, "t_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [EqualTo(event_type,error)]" in plan \
        or "EqualTo(event_type,error)" in plan


def test_ann_lsh_joins_on_buckets(spark):
    plan = _plan(spark, "sim_ann_lsh")
    assert "CartesianProduct" not in plan


def test_dedup_inverted_index_no_cartesian(spark):
    plan = _plan(spark, "d_dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan


def test_curation_pipeline_single_scan_no_cartesian(spark):
    """The curation pass is one documents scan feeding both the gate and
    the dedup aggregate — never a cartesian, and the scan reads only
    (doc_id, text)."""
    plan = _plan(spark, "d_curation_pipeline")
    tree = _final_tree(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "doc_id", "text"}


def test_streaming_matchup_batch_plan_no_cartesian(spark):
    """The stream-stream matchup on static frames must keep the cell
    equi-join shape (SortMerge/ShuffledHash on the cell keys), never a
    cartesian or broadcast-nested-loop over the range condition."""
    from nexus_spark import domain
    from nexus_spark.streaming.matchup import streaming_matchup

    out = streaming_matchup(
        domain.matchup_primary(spark, SF_DIR_T2),
        domain.matchup_secondary(spark, SF_DIR_T2),
        radius_km=300.0, time_tolerance_s=86400)
    out.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = out._jdf.queryExecution().explainString(jmode)
    tree = _final_tree(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_a2_boundary_prunes_tile_partitions(spark, tmp_path):
    """On a lake partitioned by (lat_tile, lon_tile), the A2 boundary
    recompute's tile-space ring predicate must reach the scan as
    PartitionFilters — interior files are never opened — and the result
    must equal the unpartitioned path exactly."""
    from pyspark.sql import functions as F

    from nexus_spark import domain
    from nexus_spark.plans.summary import build_summary, stats_from_summary
    from tests.conftest import SF_DIR

    obs = domain.observations(spark, SF_DIR)
    lake = str(tmp_path / "tiled_obs")
    (obs.withColumn("lat_tile", F.floor(F.col("lat") / 10.0))
        .withColumn("lon_tile", F.floor(F.col("lon") / 60.0))
        .write.partitionBy("lat_tile", "lon_tile").parquet(lake))
    pobs = spark.read.parquet(lake)

    summary = build_summary(obs, lat_tile_deg=10.0, lon_tile_deg=60.0)
    kwargs = dict(dataset="sst_a", min_lat=-25, max_lat=25,
                  min_lon=-160, max_lon=160,
                  lat_tile_deg=10.0, lon_tile_deg=60.0)
    part = stats_from_summary(pobs, summary, **kwargs)
    flat = stats_from_summary(obs, summary, **kwargs)

    def canon(df):
        return sorted(
            tuple(round(v, 9) if isinstance(v, float) else v for v in r)
            for r in df.collect())

    assert canon(part) == canon(flat)
    plan = part._jdf.queryExecution().executedPlan().toString()
    # toString truncates long lines (including the Location path), so
    # identify our scan by a NON-EMPTY PartitionFilters bracket that names
    # the tile partition columns — every other scan in this plan has
    # PartitionFilters: []. That proves the ring predicate reached the
    # file index and interior files are pruned at planning time.
    pruned = [l.split("PartitionFilters: [", 1)[1]
              for l in plan.splitlines() if "PartitionFilters: [" in l]
    assert any(not f.startswith("]") and "lat_tile" in f for f in pruned)


def test_span_dedup_plan_shape(spark):
    """span_dedup_marks must plan as hash joins on the window hash — no
    cartesian/nested-loop anywhere — and the shared-window aggregate must
    partial-aggregate map-side (partial_count before the exchange)."""
    from nexus_spark import catalog
    from nexus_spark.operators.scrub import span_dedup_marks
    from tests.conftest import SF_DIR

    docs = catalog.load_table(spark, SF_DIR, "documents")
    out = span_dedup_marks(docs, window=8)
    out.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = out._jdf.queryExecution().explainString(jmode)
    tree = _final_tree(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "partial_count" in plan  # map-side combine on the h aggregate


def test_span_dedup_memo_single_tokenize(spark):
    """Round-13 pin for the window-hash memo: with the memo warm, BOTH
    references to the (id, pos, h) stream inside span_dedup_marks read
    the InMemoryRelation — the executed plan must contain NO Generate
    (posexplode) node, i.e. the tokenize stage cannot re-run per call
    (the r12 weak-row defect: scrub.py's wins was evaluated twice)."""
    from nexus_spark import catalog
    from nexus_spark.operators import scrub
    from nexus_spark.operators.scrub import span_dedup_marks
    from tests.conftest import SF_DIR

    docs = catalog.load_table(spark, SF_DIR, "documents")
    scrub._window_hashes(docs, 8, "doc_id", "text", "xxhash64").count()
    out = span_dedup_marks(docs, window=8)
    out.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = out._jdf.queryExecution().explainString(jmode)
    tree = _final_tree(plan)
    assert "InMemoryTableScan" in tree
    assert "Generate" not in tree  # posexplode runs at memo build only
    scrub.clear_cache()


def test_warc_documents_plan_is_projection(spark, tmp_path):
    """warc_to_documents adds NO shuffle: extraction is a pure projection
    over the parsed records (one Exchange-free stage chain)."""
    from nexus_spark.sources.warc import (encode_warc, read_warc,
                                          warc_to_documents)

    recs = [{"warc_type": "response", "record_id": f"<urn:uuid:{i}>",
             "target_uri": f"https://e.org/{i}",
             "date": "2026-01-01T00:00:00Z",
             "content_type": "text/html",
             "payload": f"<p>body {i}</p>".encode()} for i in range(4)]
    (tmp_path / "x.warc").write_bytes(encode_warc(recs))
    docs = warc_to_documents(read_warc(spark, str(tmp_path)))
    docs.collect()
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_a2_rejects_mismatched_native_tiling(spark, tmp_path):
    """A lake tiled with a DIFFERENT size than the summary/arguments must
    be rejected (validated sample), not silently mis-aggregated; and
    use_native_tiles=False must recover the exact answer on that lake."""
    import pytest
    from pyspark.sql import functions as F

    from nexus_spark import domain
    from nexus_spark.plans.summary import build_summary, stats_from_summary
    from tests.conftest import SF_DIR

    obs = domain.observations(spark, SF_DIR)
    lake = str(tmp_path / "wrong_tiles")
    (obs.withColumn("lat_tile", F.floor(F.col("lat") / 5.0))   # 5 deg...
        .withColumn("lon_tile", F.floor(F.col("lon") / 30.0))
        .write.partitionBy("lat_tile", "lon_tile").parquet(lake))
    pobs = spark.read.parquet(lake)

    summary = build_summary(obs, lat_tile_deg=10.0, lon_tile_deg=60.0)
    kwargs = dict(dataset="sst_a", min_lat=-25, max_lat=25,
                  min_lon=-160, max_lon=160,
                  lat_tile_deg=10.0, lon_tile_deg=60.0)  # ...queried as 10
    with pytest.raises(ValueError, match="disagree"):
        stats_from_summary(pobs, summary, **kwargs).collect()

    def canon(df):
        return sorted(
            tuple(round(v, 9) if isinstance(v, float) else v for v in r)
            for r in df.collect())

    safe = stats_from_summary(pobs, summary, use_native_tiles=False,
                              **kwargs)
    flat = stats_from_summary(obs, summary, **kwargs)
    assert canon(safe) == canon(flat)


def test_curation_dedup_is_window_not_self_join(spark):
    """Round-6 rewrite gate: curate's fingerprint dedup is a window over
    ONE execution of the stats projection — the plan must contain a
    Window node and NO join at all (the old groupBy-then-self-join shape
    executed the expensive stats projection twice)."""
    plan = _plan(spark, "d_curation_pipeline")
    tree = _final_tree(plan)
    assert "Window" in tree
    assert "Join" not in tree  # matches SortMergeJoin/BroadcastHashJoin/...


def test_gaussian_interp_single_subtree_scatter(spark):
    """Round-6 rewrite gate: the 3x3 gaussian scatter is ONE generate
    (explode of the literal offset array) over ONE aggregation subtree —
    no unionByName fan-out replanning the grid aggregate 9x."""
    plan = _plan(spark, "g_gaussian_interp")
    tree = _final_tree(plan)
    assert "Union" not in tree
    assert len(re.findall(r"\bGenerate\b", tree)) == 1


def test_nb_classifier_no_vocab_grid_join(spark):
    """Round-6 rewrite gate: the NB scoring plan joins the token stream
    to the broadcast observed-(cls, word) terms ONCE — there is no
    vocab x classes grid, so the plan has exactly one broadcast hash
    join, one union (contrib + zero rows) and no sort-merge join."""
    plan = _plan(spark, "text_nb_classifier")
    tree = _final_tree(plan)
    assert len(re.findall(r"BroadcastHashJoin", tree)) == 1
    assert len(re.findall(r"\bUnion\b", tree)) == 1
    assert "SortMergeJoin" not in tree


def test_triangle_wedge_join_no_cartesian(spark):
    """The wedge enumeration and the closing join are equi-joins on
    (u) and (v, w) — a cartesian product here would be O(E^2) at any
    scale."""
    plan = _plan(spark, "sim_triangle_stats")
    tree = _final_tree(plan)
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_mmr_greedy_is_one_cogroup_no_driver_loop(spark):
    """Round-6 rewrite gate: the greedy MMR loop runs inside ONE
    cogrouped applyInPandas (group state bounded at pool_n^2 rows by
    construction) — the plan has exactly one FlatMapCoGroupsInPandas
    and no cartesian fallback."""
    plan = _plan(spark, "sim_mmr_select")
    tree = _final_tree(plan)
    assert len(re.findall(r"FlatMapCoGroupsInPandas", tree)) == 1
    assert "CartesianProduct" not in tree


def test_embedding_covariance_single_corpus_pass(spark):
    """The corpus pass runs exactly ONCE per covariance (collected to
    the driver by _gram_moments; round 13 replaced the checkpointed
    moment frame + broadcast-join assembly with driver-side scalar
    assembly), so the returned plan is a local-rows scan — ZERO parquet
    scans and zero mapInPandas nodes downstream."""
    plan = _plan(spark, "d_embed_covariance")
    assert "FileScan parquet" not in plan
    assert "MapInPandas" not in plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_set_ops_single_shuffle_single_orders_scan(spark):
    """Round-12 rewrite gate: customer_set_ops is a union scan + ONE
    groupBy shuffle + tag explode. The pre-rewrite INTERSECT/EXCEPT
    form referenced the intersect subtree from both union branches and
    paid the orders shuffle twice; the membership-flag plan must scan
    orders exactly once and shuffle exactly once (the exchange under
    the final aggregate; AQE reads stay AQEShuffleRead)."""
    plan = _plan(spark, "sql_set_ops")
    tree = _final_tree(plan)
    assert tree.count("Exchange") == 1, tree
    orders_scans = len(re.findall(r"orders\.parquet", plan))
    assert orders_scans == 1, plan[:2000]


def test_step_funnel_single_shuffle_single_events_scan(spark):
    """Round-12 rewrite gate: event_step_funnel is ONE events scan and
    ONE user_id exchange (the chained dependent windows + the
    co-partitioned per-user groupBy all reuse it); the four funnel
    counts unpivot from one single-row aggregate (its exchange is a
    1-row SinglePartition gather, not a data shuffle). The pre-rewrite
    join chain scanned events 7x."""
    plan = _plan(spark, "sql_step_funnel")
    tree = _final_tree(plan)
    events_scans = len(re.findall(r"events\.parquet", plan))
    assert events_scans == 1, plan[:2000]
    # exactly two exchanges: the user_id data shuffle feeding the
    # window stack, and the 1-row SinglePartition gather for the
    # global count aggregate
    assert tree.count("Exchange") == 2, tree
    assert "SinglePartition" in plan
    # the three dependent windows stack on ONE sort with no re-shuffle
    assert tree.count("Window") == 3 and tree.count("Sort") == 1, tree
