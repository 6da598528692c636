"""Generic relational surface over the star schema — the capabilities the
reference gets "for free from Spark SQL" in the rebuild (SURVEY §2.7):
multi-way joins, windows, grouping sets/rollup, set operators, semi/anti
joins, sessionization.

Plan discipline (checked via .explain in tests): dimension tables broadcast
(region/nation/customer/supplier/part are all far under the broadcast
threshold), fact-fact joins shuffle once on the join key, aggregations
partial-aggregate map-side. These are the patterns that carry to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_before: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1-style pricing summary: one scan, one low-cardinality
    groupBy — pure map-side partial aggregation."""
    li = lineitem.where(F.col("l_shipdate") <= F.lit(ship_before))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, segment: str = "BUILDING",
                      cutoff: str = "1996-03-15", topn: int = 10) -> DataFrame:
    """TPC-H Q3-style: broadcast customer filter into orders, shuffle join
    lineitem on orderkey, top-N on revenue (TakeOrdered — no full sort)."""
    c = customer.where(F.col("c_mktsegment") == segment)
    o = orders.where(F.col("o_orderdate") < F.lit(cutoff))
    l = lineitem.where(F.col("l_shipdate") > F.lit(cutoff))
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.round(F.col("revenue"), 6).desc(), F.col("l_orderkey"))
        .limit(topn)
    )


def regional_revenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                     orders: DataFrame, lineitem: DataFrame,
                     supplier: DataFrame, region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q5-style local-supplier revenue: five-way join where every
    dimension side broadcasts; only orders⋈lineitem shuffles."""
    r = region.where(F.col("r_name") == region_name)
    dims = (
        nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


def topk_per_group(part: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k: k most expensive parts per brand (rank over
    partitioned window; single shuffle on the partition key)."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return (
        part.withColumn("price_rank", F.row_number().over(w))
        .where(F.col("price_rank") <= k)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank")
    )


def orders_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP (year, priority): subtotals + grand total in one pass."""
    return (
        orders.rollup(F.year("o_orderdate").alias("o_year"),
                      F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("o_totalprice").alias("total_price"))
    )


def customer_set_ops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set-operator surface: customers WITH orders (intersect) minus
    high-balance ones (except), as one labeled union tagging each.

    Evaluated as a SINGLE membership-flag aggregate instead of literal
    INTERSECT/EXCEPT operators: the naive form references the intersect
    subtree (a shuffle over the full orders fact) from BOTH union
    branches, and Spark evaluates a multiply-referenced subtree once
    per reference — at sf1 that paid the 6M-row orders shuffle twice
    (round-11 verdict). Here each side contributes membership flags
    (customer rows carry in_cust + the balance predicate, order rows
    carry in_ord), ONE groupBy(c_custkey) folds them, and the 1-or-2
    output tags per qualifying key come from exploding a literal array
    — so the whole query is a union scan + one shuffle, no repeated
    subtree and no cache/checkpoint to manage. Identical set semantics:
    intersect = in_cust AND in_ord (both sides deduped by the groupBy);
    except-distinct = AND NOT high_bal (c_custkey is the customer PK,
    so the high-balance predicate is per-key well-defined)."""
    flags = customer.select(
        "c_custkey",
        F.lit(1).alias("in_cust"),
        (F.col("c_acctbal") > 5000).cast("int").alias("high_bal"),
        F.lit(0).alias("in_ord"),
    ).unionByName(orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.lit(0).alias("in_cust"),
        F.lit(0).alias("high_bal"),
        F.lit(1).alias("in_ord"),
    )).groupBy("c_custkey").agg(
        F.max("in_cust").alias("in_cust"),
        F.max("high_bal").alias("high_bal"),
        F.max("in_ord").alias("in_ord"),
    )
    tags = F.when(F.col("high_bal") == 1, F.array(F.lit("with_orders"))) \
        .otherwise(F.array(F.lit("with_orders"),
                           F.lit("active_low_balance")))
    return (flags
            .where((F.col("in_cust") == 1) & (F.col("in_ord") == 1))
            .select("c_custkey", F.explode(tags).alias("tag")))


def customers_without_orders(customer: DataFrame, orders: DataFrame,
                             min_price: float = 0.0) -> DataFrame:
    """Anti join: customers with no order above min_price."""
    big = orders.where(F.col("o_totalprice") > min_price)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


def customer_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join: every customer with their order count and total,
    zero-filled for customers with no orders (null-handling surface)."""
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("tot"))
    return (
        customer.join(agg, customer.c_custkey == agg.o_custkey, "left")
        .select("c_custkey", "c_mktsegment",
                F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
                F.coalesce(F.col("tot"), F.lit(0.0)).alias("total_spend"))
    )


def customers_with_urgent_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi join: customers having at least one 1-URGENT order (EXISTS)."""
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey,
                      "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user session ids from inactivity gaps (lag +
    running sum of break flags), then per-session stats. Two window passes
    over the same (user_id, ts) partitioning — one shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_breaks = events.withColumn(
        "is_break",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    with_sessions = with_breaks.withColumn(
        "session_seq", F.sum("is_break").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_sessions.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.sum("value").alias("session_value"))
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured surface: extract a JSON field from the props column
    and aggregate on it (JVM-side JSON path evaluation)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type", F.floor(F.col("k") / 10).cast("int").alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.avg("k").alias("k_avg"),
             F.avg("value").alias("v_avg"))
    )


def distinct_counts(lineitem: DataFrame) -> DataFrame:
    """Exact multi-column distinct aggregates in one pass."""
    return lineitem.agg(
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_suppkey").alias("d_supps"),
        F.countDistinct("l_orderkey").alias("d_orders"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("d_flag_status"),
    )


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact interpolated quantiles per event_type (Spark `percentile` and
    DuckDB `quantile_cont` share the linear-interpolation definition —
    verified bit-equal at 6 dp on this fixture)."""
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count("value").alias("n"),
    )


def hourly_events(events: DataFrame) -> DataFrame:
    """Batch equivalent of the streaming tumbling-window aggregate —
    the kappa-architecture oracle for streaming.windowed_stats."""
    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("w_start"),
                       "event_type")
        .agg(F.count(F.lit(1)).alias("ev_cnt"),
             F.avg("value").alias("ev_avg"),
             F.min("value").alias("ev_min"),
             F.max("value").alias("ev_max"))
    )


def approx_profile(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Sketch-based data profile per event_type: HyperLogLog++ distinct
    users (approx_count_distinct, relative sd `rsd`) and quantile sketches
    of the value column (percentile_approx / Greenwald-Khanna).

    This is the 100 TB profiling shape: both sketches are bounded-memory,
    single-pass, and MERGEABLE — partial sketches combine associatively
    across partitions, so the plan is one map-side-combined aggregation
    with O(types * sketch_size) state, no matter the row count. An exact
    count-distinct would shuffle every (type, user) pair; the sketch
    shuffles kilobytes.

    No cross-engine oracle by design (sketch internals are
    engine-specific); accuracy is asserted against exact answers in
    tests/test_sampling.py within the published error bounds.
    """
    return (events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.percentile_approx(
            "value", [0.5, 0.95, 0.99], 10000).alias("value_quantiles"),
        F.count(F.lit(1)).alias("n_events")))


def approx_profile_checked(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """`approx_profile` with its accuracy contract made cross-engine
    checkable: the sketch estimates are compared in-plan against exact
    references and reduced to deterministic boolean flags, so an ANSI-SQL
    oracle can assert the exact columns plus literal TRUE flags.

    Bounds (both are loose by design — the check must be deterministic,
    not tight):
      * HLL++ distinct users at rsd=0.02 -> |approx-exact|/exact <= 0.10
        (5 standard errors; P(violation) ~ 1e-6 per group).
      * GK quantiles at accuracy 10000 (rank error eps = 1e-4): the
        returned value is an actual sample whose rank is within eps*n of
        the target, hence it lies between the exact interpolated
        quantiles at p -/+ 0.01 (a 100x margin; the p99 upper bound
        clamps to 1.0 = max).

    The exact countDistinct / percentile branch is the VERIFICATION
    harness, not the production profile — at 100 TB you run
    `approx_profile` alone (mergeable kilobyte sketches); this query
    exists so the driver can check the sketches against ground truth.
    The join on event_type broadcasts (few groups).
    """
    prof = approx_profile(events, rsd)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("users_exact"),
        F.expr("percentile(value, array(0.49D, 0.51D, 0.94D, 0.96D, "
               "0.98D, 1.0D))").alias("qb"),
    )
    j = prof.join(F.broadcast(exact), "event_type")
    q = F.col("value_quantiles")
    b = F.col("qb")
    return j.select(
        "event_type",
        "n_events",
        "users_exact",
        (F.abs(F.col("approx_users") - F.col("users_exact"))
         <= 0.10 * F.col("users_exact")).alias("users_ok"),
        q[0].between(b[0], b[1]).alias("p50_ok"),
        q[1].between(b[2], b[3]).alias("p95_ok"),
        q[2].between(b[4], b[5]).alias("p99_ok"),
    )


def lineitem_grouping_sets(lineitem: DataFrame) -> DataFrame:
    """GROUPING SETS ((returnflag, linestatus), (returnflag), ()) in ONE
    aggregation pass — detail cells, per-flag subtotals, and the grand
    total share a single shuffle instead of three scans + a union
    (reference parity: multi-level rollup reports; same single-pass
    expansion strategy both engines use for grouping sets).

    `gid` = grouping(l_returnflag)*2 + grouping(l_linestatus) labels the
    aggregation level portably (Spark's grouping_id() bit order is
    engine-specific; the explicit formula is not).
    """
    return (
        lineitem.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            F.col("l_returnflag"), F.col("l_linestatus"))
        .agg((F.grouping("l_returnflag") * 2
              + F.grouping("l_linestatus")).cast("int").alias("gid"),
             F.count(F.lit(1)).alias("n_items"),
             F.sum("l_quantity").alias("sum_qty"),
             F.avg("l_extendedprice").alias("avg_price"))
    )


def event_step_funnel(events: DataFrame,
                      steps: tuple[str, str, str] = ("view", "click",
                                                    "purchase")) -> DataFrame:
    """ORDERED conversion funnel: a user reaches step N only with an
    event of type N STRICTLY AFTER their step-(N-1) arrival time — the
    product-analytics funnel (signup → activation → purchase), which
    the unordered quality funnel is not.

    Shape: ONE events scan and ONE user_id shuffle. The previous
    join-chain form (per-step aggregate joining the previous step's
    arrival) referenced each step frame from both the next step AND its
    own count branch, and Spark evaluates a multiply-referenced subtree
    once per reference — at sf1 the step-1 aggregate ran 3x and the
    events scan 7x (round-11 verdict: 4.0x DuckDB, whose CTEs
    materialize once). Now the strictly-after arrival times are
    per-user window minima chained over the SAME partitioning (t_N =
    min ts of step-N events after t_{N-1}; one exchange + one sort,
    the dependent windows stack without re-shuffling), a co-partitioned
    groupBy collapses to one row per user, and all four funnel counts
    come out of ONE global aggregate unpivoted to rows — no subtree is
    referenced twice anywhere in the plan. Ordering is still enforced
    relationally (no per-user array state; window buffers are one
    user's rows). Output: step, step_idx, n_users — counts are
    necessarily non-increasing.
    """
    s1, s2, s3 = steps
    w = Window.partitionBy("user_id")
    x = (events.select("user_id", "ts", "event_type")
         .withColumn("t1", F.min(F.when(F.col("event_type") == s1,
                                        F.col("ts"))).over(w)))
    x = x.withColumn("t2", F.min(F.when(
        (F.col("event_type") == s2) & (F.col("ts") > F.col("t1")),
        F.col("ts"))).over(w))
    x = x.withColumn("t3", F.min(F.when(
        (F.col("event_type") == s3) & (F.col("ts") > F.col("t2")),
        F.col("ts"))).over(w))
    per_user = x.groupBy("user_id").agg(F.min("t1").alias("t1"),
                                        F.min("t2").alias("t2"),
                                        F.min("t3").alias("t3"))
    counts = per_user.agg(F.count(F.lit(1)).alias("n0"),
                          F.count("t1").alias("n1"),
                          F.count("t2").alias("n2"),
                          F.count("t3").alias("n3"))
    step_rows = F.array(*[
        F.struct(F.lit(step).alias("step"),
                 F.lit(idx).alias("step_idx"),
                 F.col(f"n{idx}").alias("n_users"))
        for idx, step in enumerate(("all_users", s1, s2, s3))])
    return counts.select(F.explode(step_rows).alias("r")).select("r.*")


def event_retention_cohorts(events: DataFrame,
                            week_days: int = 7) -> DataFrame:
    """Cohort retention matrix: users grouped by FIRST-event week,
    counted distinct per (cohort_week, weeks-since-cohort offset) —
    the standard engagement triangle.

    Two aggregates: first-seen per user (one user_id shuffle), then a
    co-partitioned join back and a distinct count per (cohort, offset)
    cell. The matrix is (weeks x weeks)/2 rows — always tiny relative
    to the events scanned. Output: cohort_week (date of week start),
    week_offset, n_users.
    """
    first = (events.groupBy("user_id")
             .agg(F.min(F.to_date("ts")).alias("first_day")))
    joined = events.join(first, "user_id")
    cohort_week = F.date_sub(
        F.col("first_day"),
        (F.datediff(F.col("first_day"), F.lit("2024-01-01"))
         % week_days))
    offset = F.floor(
        F.datediff(F.to_date("ts"), F.col("first_day"))
        / week_days).cast("int")
    return (joined
            .select(cohort_week.alias("cohort_week"),
                    offset.alias("week_offset"), "user_id")
            .groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("user_id").alias("n_users")))


def anomaly_zscore(events: DataFrame, min_abs_z: float = 2.0) -> DataFrame:
    """Hourly volume anomalies per event type: z-score of each hour's
    count against that type's own hourly distribution, keeping hours
    with |z| >= min_abs_z — the monitoring pass a pipeline runs over
    its ingest ledger to catch traffic spikes/outages.

    One scan -> one (type, hour) aggregate -> one window partitioned by
    type. The window state is hours-per-type rows (bounded by the time
    range, not the event volume), so the plan holds at any event scale;
    the heavy reduction happens in the map-side-combined count.

    Output: event_type, w_start, ev_cnt, z.
    """
    hourly = (events.groupBy("event_type",
                             F.date_trunc("hour", "ts").alias("w_start"))
              .agg(F.count(F.lit(1)).alias("ev_cnt")))
    w = Window.partitionBy("event_type")
    z = ((F.col("ev_cnt") - F.avg("ev_cnt").over(w))
         / F.stddev_samp("ev_cnt").over(w))
    return (hourly.withColumn("z", z)
            .where(F.abs(F.col("z")) >= min_abs_z)
            .select("event_type", "w_start", "ev_cnt", "z"))
