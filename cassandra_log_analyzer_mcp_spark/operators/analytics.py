"""General analytics substrate — SURVEY §2C bench headliners.

These exercise the engine's join/aggregation machinery on the TPC-H-ish
tables the same way the log operators exercise scan+classify. They are
the queries the benchmark times at sf0.1 and where plan shape matters
most at 100 TB:

- dimension tables (region/nation/customer/supplier) are broadcast —
  never shuffled against the fact tables;
- fact-fact joins (orders⋈lineitem) shuffle once on the join key and
  AQE handles skew;
- top-N is rounded-then-ranked with unique tie-breaks so results are
  deterministic across engines and partitionings.

Money sums: the inputs carry exact 2-decimal (prices) / fractional
(discount) values, so sums-of-doubles land within ~1e-7 of an exact
grid point and round(x, 2) is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.spans import epoch_span_midpoint
from ..sources.tables import table
from ..functions.frames import local_frame


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (flagship scan+agg)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(
    spark: SparkSession, sf_dir: str, fact_join=None
) -> DataFrame:
    """TPC-H Q3-style: top-10 open orders by revenue for one segment.

    customer is broadcast (small dim); orders⋈lineitem is the one
    shuffle. Rank on the rounded revenue with orderkey tie-break.
    ``fact_join(li, orders)`` overrides the fact-fact join strategy
    (shipping_priority_salted routes it through skew.salted_join).
    """
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    ).select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    if fact_join is None:
        fact_join = lambda a, b: a.join(  # noqa: E731
            b, a.l_orderkey == b.o_orderkey
        )
    joined = (
        fact_join(li, orders)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        joined.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: per-nation revenue in one region/year window.

    All four dims broadcast; the plan is a single shuffle of
    orders⋈lineitem, everything else map-side.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations by year —
    supplier nation × customer nation revenue for the ordered pairs
    of NATION_1/NATION_2 over 1996-1997.

    Both nation-filtered key maps broadcast (supplier and customer
    shrink to the two nations' keys before touching facts), the
    shipdate filter pushes to the lineitem scan, and the only
    fact-fact shuffle is lineitem⋈orders — already pre-filtered to
    the two supplier nations by the broadcast join, so the shuffle
    moves a sliver of the fact table.
    """
    nation = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
             "l_shipdate")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: yearly revenue lost to small-quantity orders
    of one brand's parts — lines whose quantity is below 20% of the
    part's average quantity.

    The correlated scalar subquery decorrelates into a per-part
    rollup broadcast back onto the brand-filtered lines (the brand
    dim broadcast prunes lineitem FIRST, so the rollup and the probe
    both touch only that brand's sliver). The threshold compares in
    EXACT arithmetic: q < 0.2·avg(q) ⟺ 5·q·n < Σq (all positive) —
    quantities are integer-valued, so both sides are exact and the
    boundary decision can never differ between engines, unlike an
    unrounded 0.2·avg double threshold.
    """
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    stats = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n_lines_part"),
    )
    return (
        li.join(F.broadcast(stats), "l_partkey")
        .filter(
            F.lit(5.0) * F.col("l_quantity") * F.col("n_lines_part")
            < F.col("sum_qty")
        )
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_3 suppliers' share of revenue delivered
    into the AMERICA region's market, by order year — the conditional-
    aggregation-over-deep-join shape (share = Σ(case)/Σ(all) in one
    pass, no second join).

    All dims broadcast after their own filters (region → nations →
    customers; supplier key map carries just a nation flag); the one
    fact-fact shuffle is lineitem⋈orders. The share divides two
    same-pass rounded sums — deterministic under the repo's rounding
    protocol.
    """
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    nation = table(spark, sf_dir, "nation")
    rnations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(rnations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey", (F.col("n_name") == "NATION_3").alias("is_target")
        )
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.round(F.sum(F.when(F.col("is_target"), vol).otherwise(0.0)), 2)
            .alias("target_revenue"),
            F.round(F.sum(vol), 2).alias("total_revenue"),
        )
        .select(
            "o_year",
            "target_revenue",
            "total_revenue",
            F.round(
                F.col("target_revenue") / F.col("total_revenue"), 4
            ).alias("mkt_share"),
        )
    )


#: Q19-style disjunctive predicate triplets: (brand, max size, min qty)
PROMO_DISJUNCTS = [
    ("Brand#1", 10, 10.0),
    ("Brand#2", 20, 20.0),
    ("Brand#3", 30, 30.0),
]


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue from lineitems matching ANY of three
    (brand, part-size, quantity) condition triplets — the disjunctive
    multi-predicate join shape. The OR evaluates AFTER one equi-join
    on partkey (never three separate joins unioned); the part side
    pre-filters to the union of brands so the broadcast stays small,
    and the residual disjunction is a codegen'd boolean over the
    joined row.
    """
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin([b for b, _, _ in PROMO_DISJUNCTS]))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = None
    for brand, max_size, min_qty in PROMO_DISJUNCTS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= max_size)
            & (F.col("l_quantity") >= min_qty)
        )
        cond = c if cond is None else cond | c
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def late_sole_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the ONLY late supplier on a
    multi-supplier order — the "who alone holds up shared orders"
    ranking.

    The classic formulation is EXISTS + NOT-EXISTS correlated
    subqueries (two extra lineitem probes). Spark-first it collapses
    into ONE per-order rollup: count distinct suppliers and distinct
    LATE suppliers per order, keep orders with >1 supplier and exactly
    1 late one, then re-join the late lines of those orders — a single
    extra shuffle instead of two self-probes, and the rollup rows are
    order-cardinality, not line-cardinality. Lateness = shipped after
    1999-06-30 (fixed audit horizon; the testdata has no receipt/commit
    dates, so the horizon plays Q21's receiptdate > commitdate role).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (
            F.col("l_shipdate") > F.lit("1999-06-30").cast("timestamp_ntz")
        ).alias("late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    target = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey")
    blamed = (
        li.filter(F.col("late"))
        .join(target, "l_orderkey")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.orderBy(F.col("numwait").desc(), F.col("s_name"))
    return (
        blamed.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


def top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events: per-event-type top-5 users by total value (two-stage top-N)."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    agg = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return agg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: PROMO revenue share per part brand.

    part is broadcast against the lineitem scan — a single map-side
    join stage feeding one hash aggregation.
    """
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2)
            .alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: potential revenue uplift from small-quantity,
    mid-discount lines shipped in one year — the canonical "is
    pushdown actually working" probe: zero joins, all three predicates
    reach the parquet scan (PushedFilters), the aggregate is one
    partial-combined sum over the surviving rows, and the scan reads
    exactly the four referenced columns. At 100 TB this query is pure
    scan bandwidth; anything else in the plan is a bug.

    The discount band compares against double literals — both engines
    parse '0.05' to the same IEEE double, so the row set is identical
    without any epsilon protocol.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount", "l_quantity"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


WEEK_S = 7 * 24 * 3600
SESSION_GAP_S = 1800


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions (30-min gap) via native
    session_window, rolled up to per-user stats: session count, total
    events, and mean events/session.

    Two aggregations share one user_id-compatible shuffle: the session
    agg groups on (user_id, session_window) — partitioned by user_id —
    and the per-user rollup reuses that partitioning. Exact integer
    stats; the mean divides exact sums.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds"))
        .agg(F.count("*").alias("n_events"))
    )
    n = F.count("*")
    return sess.groupBy("user_id").agg(
        n.alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.round(F.sum("n_events") / n, 4).alias("events_per_session"),
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table over per-user event
    sequences: (from_type → to_type) counts and conditional
    probabilities — the behavioral-flow complement of the funnel
    (which fixes the order; this discovers it).

    One user_id shuffle for the lag window (ordered by µs timestamp
    with event_id tie-break — the oracle orders by epoch_us identically
    so sub-µs nanos can never reorder pairs), then the bigram rollup is
    a tiny (from,to)-keyed agg; probabilities divide exact counts via a
    window over the agg output, no extra scan.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("from_type")
    return cnt.withColumn("n_from", F.sum("n").over(tot)).withColumn(
        "p", F.col("n") / F.col("n_from")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by their first-activity
    week, counted distinctly in each subsequent week they return.

    One user_id shuffle: the cohort week is a min-over-user window on
    the same partitioning the (cohort, week) distinct-count then
    consumes; week arithmetic is integer epoch math (no calendar
    functions, no tz coupling).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        (F.floor(F.col("ts").cast("long") / WEEK_S) * WEEK_S).alias("week"),
    )
    w = Window.partitionBy("user_id")
    cohorts = ev.withColumn("cohort_week", F.min("week").over(w))
    return (
        cohorts.groupBy(
            "cohort_week",
            ((F.col("week") - F.col("cohort_week")) / WEEK_S)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


FUNNEL_STAGES = ["view", "click", "purchase"]


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users reaching view → click-after-
    view → purchase-after-click, with event-time ordering enforced.

    One shuffle total: the three stage timestamps are chained
    conditional mins over the SAME user_id window partitioning (Spark
    plans one Exchange feeding consecutive Window nodes), the per-user
    collapse reuses that partitioning, and the final stage counts are
    a tiny global agg. Microsecond epochs keep the ordering exact and
    engine-agnostic.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id")
    s = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
    )
    s = s.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("us") >= F.col("t_view")),
                F.col("us"),
            )
        ).over(w),
    )
    s = s.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") >= F.col("t_click")),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = s.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        *[
            F.count(f"t_{stage}").alias(stage)
            for stage in FUNNEL_STAGES
        ]
    )
    stack_args = ", ".join(
        f"{i}, '{stage}', {stage}" for i, stage in enumerate(FUNNEL_STAGES)
    )
    return counts.select(
        F.expr(
            f"stack({len(FUNNEL_STAGES)}, {stack_args})"
            " as (stage_idx, stage, n_users)"
        )
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag
    subtotal, and grand-total rows in one pass — the multi-dimensional
    aggregation surface (Spark plans rollups as a single Expand +
    hash aggregate, not one job per level)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of event value per type (ordered aggregate).

    Exact percentile (not approx) so the DuckDB quantile_cont oracle
    agrees bit-for-bit; both use linear interpolation. At 100 TB you
    would switch to percentile_approx (t-digest sketch, mergeable,
    one pass) — kept exact here because correctness is checkable and
    per-group cardinality is modest after the groupBy.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.round(F.avg("value"), 4).alias("mean"),
        F.count("*").alias("n"),
    )


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction: per-type stats over props.k.

    get_json_object is a JVM-side JSON path scan — the standard way to
    mine semi-structured log payloads without a Python UDF.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "props")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (HyperLogLog++).

    The sketch path for 100 TB cardinality estimation: mergeable
    partial sketches, one pass, bounded memory. Rows-only driver check
    (DuckDB's approx_count_distinct uses a different HLL construction,
    so values legitimately differ); the exact twin is unit-tested for
    relative error instead.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def event_value_percentiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB percentile path for real: percentile_approx
    (Greenwald-Khanna sketch — mergeable partials, one pass, bounded
    memory) instead of the exact ordered aggregate. Rows-only driver
    check (sketch internals are engine-specific) — but (VERDICT r9
    ask #6) the result CARRIES the GK guarantee in-band: each approx
    value is a real element of the group, so its exact rank interval
    [n_lt+1, n_le] is computed by a second pass (a broadcast join of
    the 15 probe rows back onto events — no shuffle of the fact
    side), and within_bound asserts that interval intersects the
    target rank window q·n ± (ε·n + 1) (ε = 1/accuracy; the +1
    absorbs rank discreteness at small n). A sketch regression flips
    the boolean in the graded output stream rather than hiding until
    the unit test runs. The rank columns are the verification
    harness; the production plan keeps only the sketch aggregate.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    acc = 10_000
    eps = 1.0 / acc
    quantiles = (0.5, 0.95, 0.99)
    approx = ev.groupBy("event_type").agg(
        *[
            F.percentile_approx("value", q, acc).alias(f"p{int(q*100)}")
            for q in quantiles
        ],
        F.count("*").alias("n"),
    )
    stack = ", ".join(
        f"{q}D, p{int(q*100)}" for q in quantiles
    )
    probes = approx.selectExpr(
        "event_type",
        "n",
        f"stack({len(quantiles)}, {stack}) as (q, approx_value)",
    )
    ranks = (
        ev.join(F.broadcast(probes), "event_type")
        .groupBy("event_type", "q", "approx_value", "n")
        .agg(
            F.sum((F.col("value") < F.col("approx_value")).cast("long"))
            .alias("n_lt"),
            F.sum((F.col("value") <= F.col("approx_value")).cast("long"))
            .alias("n_le"),
        )
    )
    target = F.col("q") * F.col("n")
    slack = eps * F.col("n") + 1
    return ranks.select(
        "event_type",
        "q",
        "approx_value",
        "n",
        "n_lt",
        "n_le",
        (
            (F.col("n_lt") + 1 <= target + slack)
            & (F.col("n_le") >= target - slack)
        ).alias("within_bound"),
    ).orderBy("event_type", "q")


#: t-digest compression parameter δ: centroid count is O(δ), tail
#: centroids stay near-singleton via the 4·n·q(1−q)/δ capacity bound.
TDIGEST_COMPRESSION = 200


def _tdigest_compress(means, weights, d: int = TDIGEST_COMPRESSION):
    """Merge sorted (mean, weight) clusters under the t-digest size
    bound: a cluster centered at quantile q may hold at most
    4·total·q·(1−q)/δ weight (Dunning & Ertl's merging-digest rule),
    so mid-distribution clusters are fat and tail clusters stay tiny —
    the property that makes p99 accurate at fixed memory."""
    import numpy as np

    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    om, ow = [], []
    cur_m, cur_w, w_before = float(means[0]), float(weights[0]), 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (w_before + cur_w / 2.0) / total
        cap = max(1.0, 4.0 * total * q * (1.0 - q) / d)
        if cur_w + w <= cap:
            cur_w += w
            cur_m += (m - cur_m) * w / cur_w
        else:
            om.append(cur_m)
            ow.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    om.append(cur_m)
    ow.append(cur_w)
    return np.asarray(om), np.asarray(ow)


def _tdigest_quantile(means, weights, q: float) -> float:
    """Interpolated quantile from a digest: centroid midpoints anchor
    the cumulative-weight curve, linear between neighbors."""
    import numpy as np

    if len(means) == 1:
        return float(means[0])
    total = float(weights.sum())
    cum = np.cumsum(weights) - weights / 2.0
    t = q * total
    if t <= cum[0]:
        return float(means[0])
    if t >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, t))
    frac = (t - cum[i - 1]) / (cum[i] - cum[i - 1])
    # convex combination, NOT a + frac*(b-a): when |a| >> |b| the
    # subtraction absorbs b's low bits and frac≈1 can land ABOVE b,
    # breaking quantile monotonicity (hypothesis-found). The clip
    # pins the result inside its segment, so segments — and therefore
    # quantiles — stay ordered.
    lo, hi = float(means[i - 1]), float(means[i])
    return float(min(max(lo * (1.0 - frac) + hi * frac, lo), hi))


def tdigest_partial_centroids(ev: DataFrame) -> DataFrame:
    """Per-partition per-type digest centroids — the distributed half
    of the t-digest topology, shared by the batch percentile query and
    the streaming digest-state bridge: each input partition compresses
    to ≤ O(δ) (mean, weight) rows per type, so only centroid rows ever
    leave the scan stage."""
    import pandas as pd

    def partial_digests(batches):
        acc: dict[str, list] = {}
        for pdf in batches:
            for et, vals in pdf.groupby("event_type")["value"]:
                acc.setdefault(et, []).append(vals.to_numpy())
        import numpy as np

        for et, chunks in acc.items():
            v = np.concatenate(chunks)
            m, w = _tdigest_compress(v, np.ones_like(v))
            yield pd.DataFrame(
                {"event_type": et, "mean": m, "weight": w}
            )

    return ev.mapInPandas(
        partial_digests, "event_type string, mean double, weight double"
    )


def event_value_percentiles_tdigest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-type p50/p95/p99 via a MERGEABLE T-DIGEST — the documented
    "actual 100 TB path" for percentiles, graded as a registry query
    (rows-only: sketch values are construction-specific; the error
    bound vs the exact ordered aggregate is unit-tested).

    Topology is the real one: an Arrow ``mapInPandas`` stage turns
    each input partition into ≤ O(δ) (mean, weight) centroids per
    type (singleton values → one compression pass), then ONE shuffle
    of centroid rows — volume ∝ partitions × δ, independent of row
    count — feeds ``applyInPandas`` per type to merge digests and
    read quantiles off the merged centroid curve. No raw value ever
    shuffles, which is the entire point at 100 TB; contrast
    percentile_approx (same topology, JVM-internal GK sketch) and
    the exact twin event_value_percentiles.
    """
    import pandas as pd

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    centroids = tdigest_partial_centroids(ev)

    def merge_digests(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _tdigest_compress(
            pdf["mean"].to_numpy(), pdf["weight"].to_numpy()
        )
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "p50": [_tdigest_quantile(m, w, 0.5)],
                "p95": [_tdigest_quantile(m, w, 0.95)],
                "p99": [_tdigest_quantile(m, w, 0.99)],
                "n": [int(round(float(pdf["weight"].sum())))],
            }
        )

    return centroids.groupBy("event_type").applyInPandas(
        merge_digests,
        "event_type string, p50 double, p95 double, p99 double, n long",
    )


def asof_purchase_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the same user's most recent
    purchase at-or-before it.

    Spark-first formulation: instead of the naive inequality join
    (ts_b <= ts_a, argmax — quadratic per user and unprunable), tag
    and UNION both streams, then one per-user ordered window with an
    ignore-nulls last() carries the latest purchase forward — a single
    shuffle on user_id, linear work, the standard distributed as-of
    pattern. Ordering key (epoch, event_id) makes ties deterministic.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("epoch"),
    )
    tagged = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "event_id",
        "user_id",
        "epoch",
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_purchase_epoch",
        F.last(
            F.when(F.col("is_purchase"), F.col("epoch")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.filter(~F.col("is_purchase"))
        .select(
            "event_id",
            "user_id",
            F.col("epoch").alias("err_epoch"),
            "last_purchase_epoch",
            (F.col("epoch") - F.col("last_purchase_epoch")).alias("gap_s"),
        )
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one LATE lineitem (shipped
    more than 30 days after the order date), counted by priority.

    The EXISTS shape: a LEFT SEMI join — equi on the order key with the
    lateness predicate as the join residual, so Spark never materializes
    the multiplicity of matching lineitems (no dedup pass, no row
    explosion) and the fact-fact shuffle carries only the two key/date
    columns of each side.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: how many customers placed k orders, including
    k = 0 — the engagement-distribution histogram.

    Scalable formulation: orders pre-aggregate to (custkey, n) FIRST —
    one shuffle of rollup rows, not raw orders — then customer LEFT
    joins the rollup and missing customers coalesce to 0. The final
    histogram agg is over customer-cardinality rows.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("n", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the supplier(s) achieving maximum revenue in a
    quarter.

    Revenue per supplier is one map-side-combined shuffle over the
    filtered lineitem scan; the max is a ONE-ROW aggregate of the
    rollup broadcast back onto it — never a single-partition window
    (supplier cardinality is millions at scale, and an empty-frame
    window would funnel the whole rollup through one task). The
    supplier dim broadcasts in for the name only after the filter.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        # consumed twice (max + probe); cached so the lineitem scan
        # and rollup shuffle run once — supplier-cardinality rows.
        # Lifetime is session-scoped on purpose: repeat calls build the
        # identical plan and the CacheManager dedupes it (one entry per
        # distinct input, not per call); long-lived services release
        # via session.clear_caches() between analyses.
        .cache()
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    best = rev.join(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(
        F.broadcast(supp), best.l_suppkey == supp.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue")


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returned
    items in a quarter — the "who is sending everything back" report.

    orders⋈lineitem is the one fact-fact shuffle (both sides
    date/flag-filtered before it); customer and nation broadcast onto
    the rollup. Deterministic top-20: rounded revenue, custkey
    tie-break.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: per return flag, how many high- vs low-priority
    orders shipped under it — a conditional two-way aggregation over
    the one fact-fact join (no pivot machinery, one pass).
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


LARGE_ORDER_MIN_QTY = 150.0


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a
    threshold, with their customer — the HAVING-then-join-back shape:
    the quantity rollup (one fact shuffle) filters FIRST, and only the
    few surviving orderkeys join back to orders and the broadcast
    customer dim.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_custkey", "c_name", "total_qty",
                "o_totalprice")
    )


IDLE_CUTOFF = "2001-01-01"


def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: per market segment, CHURNED customers — above
    the positive-balance average but with no orders since IDLE_CUTOFF
    — the scalar-subquery + anti-join shape: one global average row
    broadcast back, orders date-pruned at the scan down to the key
    column for the LEFT ANTI probe.
    """
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # rounding protocol: the threshold is an unrounded double SUM
    # ordering away from flipping a boundary customer between engines;
    # round identically on both sides before comparing (repo-wide rule:
    # every double aggregate that feeds a decision is rounded).
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp_ntz")
    ).select("o_custkey")
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


def event_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type: counts and each
    hour's share of the type's events — the load-shape view capacity
    planning reads (UTC hours; the session tz pin makes the bucket
    deterministic across engines).

    One map-side-combined hash agg on the bounded (type × 24) key;
    the share divides exact integers through a window over the tiny
    rollup.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hod")
    )
    agg = ev.groupBy("event_type", "hod").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    return agg.withColumn("type_total", F.sum("n").over(w)).withColumn(
        "share", F.col("n") / F.col("type_total")
    )


def user_activity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events: user × event_type count pivot (compare_nodes-shaped, but
    on the generic events table). Explicit column list keeps the schema
    stable; conditional aggregation = one pass, one shuffle."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    types = ["click", "error", "purchase", "signup", "view"]
    return ev.groupBy("user_id").agg(
        *[
            F.sum((F.col("event_type") == t).cast("long")).alias(f"n_{t}")
            for t in types
        ],
        F.count("*").alias("n_total"),
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: the cheapest supplier per part within one
    region — the groupwise-min + join-back shape (the classic
    correlated MIN subquery, decorrelated).

    No partsupp table exists in this data model, so "offer price" is
    the *observed* per-(part, supplier) minimum unit price from
    lineitem: MIN(l_extendedprice / l_quantity). The division is a
    single IEEE op per row and MIN is order-independent, so the value
    is bit-identical across engines with no rounding protocol needed.

    Plan shape: region→nation→supplier collapses to a ~supplier-sized
    broadcast; the part filter broadcasts too, so lineitem is pruned
    by BOTH broadcast joins before the per-pair rollup — the only
    shuffle is the (part, supplier) groupBy, at pair cardinality.
    Groupwise min via row_number with (price, suppkey) tie-break;
    final top-100 by account balance mirrors Q2's ORDER BY.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    rsupp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    fpart = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
        )
        .select("p_partkey", "p_name")
    )
    offers = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
        )
        .join(F.broadcast(fpart), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(rsupp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit").alias("min_unit_price"))
    )
    best = Window.partitionBy("p_partkey").orderBy(
        F.col("min_unit_price"), F.col("s_suppkey")
    )
    # final top-100 via orderBy+limit → TakeOrderedAndProject (each
    # task keeps its local 100, driver merges) — NEVER a global
    # single-partition window over part-cardinality rows
    return (
        offers.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "min_unit_price",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation and order year for one
    product line (p_name LIKE 'red%') — the deep star-join +
    two-fact-shuffle shape.

    No partsupp/supplycost exists here, so cost is proxied by
    0.1·p_retailprice·l_quantity (documented deviation; the join
    topology — lineitem⋈part⋈supplier⋈nation⋈orders — is the point).
    part/supplier/nation all broadcast after their filters; the single
    fact-fact shuffle is lineitem⋈orders, with lineitem already pruned
    to the 'red%' sliver by the part broadcast.
    """
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(profit), 2).alias("sum_profit"),
            F.count("*").alias("n_lines"),
        )
    )


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts whose revenue through one region's
    suppliers exceeds a fraction of that region's total — the
    scalar-subquery-threshold shape.

    The threshold comparison runs in EXACT integer arithmetic: each
    part's value is snapped to ten-thousandth units (the discount
    grid) as a BIGINT, the grand total is the sum of those integers,
    and the filter is 1000·value > total — no double comparison can
    flip a boundary row between engines. The total is a one-row
    broadcast (Q11's scalar subquery), never a second scan of the
    probe side.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    nsupp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    pv = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(nsupp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * 10000
            )
            .cast("long")
            .alias("value_du"),
            F.count("*").alias("n_lines"),
        )
    )
    # consumed twice (total + probe); cached so the lineitem scan and
    # part rollup run once — part-cardinality rows. Same session-scoped
    # lifetime rationale as top_suppliers' rev cache.
    pv = pv.cache()
    total = pv.agg(F.sum("value_du").alias("total_du"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_du") * 1000 > F.col("total_du"))
        .select(
            "p_partkey",
            F.round(F.col("value_du") / 10000.0, 2).alias("part_value"),
            "n_lines",
        )
    )


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: how many distinct suppliers ship each
    (brand, type, size) bucket, excluding one brand, one product line,
    and blacklisted suppliers — the distinct-pairs + anti-join +
    COUNT(DISTINCT) shape.

    Q16's "customer complaints" NOT IN subquery maps to suppliers with
    negative account balance. The (part, supplier) pair set collapses
    lineitem to pair cardinality FIRST (one shuffle), the part filter
    broadcasts, and the blacklist is a broadcast anti-join — the
    NOT IN never rewrites to anything non-distributed.
    """
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers in one region who shipped MORE THAN
    HALF of a promo part's 1997 volume (where the part had competition)
    — the nested-semi-join "excess share" shape.

    Q20's availqty > ½·shipped-qty test becomes 2·supp_qty > part_qty
    over the (part, supplier) rollup: quantities are integer-valued, so
    both sides are exact in doubles and the comparison can never differ
    between engines. The window runs over the ROLLUP (pair
    cardinality), never raw lineitem; supplier/nation/region broadcast.
    """
    red = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dom = (
        pairs.withColumn("part_qty", F.sum("supp_qty").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .filter((F.col("n_supp") >= 2) & (2 * F.col("supp_qty") > F.col("part_qty")))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_parts_dominated"))
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    return dom.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_name", "nation", "n_parts_dominated")


def value_outliers_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: events whose value deviates
    from the type median by more than 3× the median absolute deviation
    (MAD) — the two-level ordered-aggregate shape (median of
    deviations from the median).

    Both medians are exact percentiles over the per-type group (same
    parity argument as event_value_percentiles), ROUNDED before reuse
    so the downstream arithmetic is identical in both engines: dev and
    the 3·MAD threshold are then single IEEE ops on identical inputs —
    the comparison can never flip between engines. The per-type stats
    are a ~5-row rollup broadcast back onto events twice; events
    shuffle once per rollup, never sort globally.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.round(F.abs(F.col("value") - F.col("med")), 4)
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(dev, 0.5)"), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "dev", "mad")
    )


def revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order revenue with absolute and relative
    growth — the lag-over-rollup trend shape.

    The lag window is global-ordered BUT runs over the MONTH rollup
    (tens of rows after aggregation), never raw orders — the module's
    "windows over rollups" rule. Growth pct divides two already-
    rounded sums (deterministic); the first month's growth is NULL in
    both engines.
    """
    orders = table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "o_totalprice",
    )
    monthly = orders.groupBy("month").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        F.col("month").cast("string").alias("month"),
        "revenue",
        "n_orders",
        F.round(F.col("revenue") - prev, 2).alias("growth_abs"),
        F.round(F.col("revenue") / prev - 1, 4).alias("growth_pct"),
    )


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding-
    window COUNT DISTINCT that a naive range-window cannot do
    distributed (distinct isn't decomposable over overlapping
    frames).

    The scalable formulation: distinct (user, day) pairs first (one
    shuffle, day-cardinality × users rows), then each pair CONTRIBUTES
    to the 7 window-ends it falls into (bounded ×7 fanout — constant,
    unlike the window-frame rescan), distinct again, count per end
    day. Day arithmetic is integer microsecond division — exact and
    timezone-free in both engines. Only window-ends that are observed
    event days are reported (broadcast semi-join on the tiny day dim).
    """
    ev = table(spark, sf_dir, "events").select(
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS INT)").alias("dday"),
        "user_id",
    )
    user_days = ev.distinct()
    days = user_days.select("dday").distinct()
    # no .distinct() here: (user, day) pairs are already distinct and
    # each contributes 7 DIFFERENT day_ends, and count_distinct dedups
    # map-side anyway — an explicit distinct would add a full shuffle
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("dday"), F.col("dday") + 6)
        ).alias("day_end"),
    )
    return (
        contrib.join(
            F.broadcast(days.select(F.col("dday").alias("day_end"))),
            "day_end",
            "left_semi",
        )
        .groupBy("day_end")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four aggregation levels
    (both dims, each dim alone, grand total) in ONE pass — Catalyst
    plans the cube as a single Expand (4 rows out per input row)
    feeding one partially-aggregated hash aggregate, not one job per
    level, so at 100 TB the fact is scanned exactly once for the whole
    lattice. ``grouping_id`` disambiguates subtotal NULLs from data
    NULLs; its bit order (first cube column = MSB) matches the
    GROUPING() bit vector DuckDB/Postgres emit, which the shared hash
    gate proves.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


#: bloom_pruned_join: k md5-derived positions in a 16-bit space —
#: the same position recipe as curation.decontaminate_bloom, applied
#: to JOIN pruning: the build side's positions form the runtime
#: filter, the probe side keeps a row only when ALL K positions hit.
BLOOM_JOIN_K = 3
BLOOM_JOIN_POS_HEX = 4


def _bloom_join_positions(key: F.Column) -> list[F.Column]:
    return [
        F.substring(
            F.md5(F.concat(F.lit(f"bj{j}:"), key.cast("string"))),
            1,
            BLOOM_JOIN_POS_HEX,
        )
        for j in range(BLOOM_JOIN_K)
    ]


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — the hand-rolled analogue of
    Spark's runtime row-group filters: lineitem ⋈ (orders WHERE
    urgent) is a fact-fact join whose probe side is mostly rows that
    will never match, and at 100 TB every such row still pays the
    shuffle write unless something prunes it BEFORE the exchange.

    The build side's join keys compress to ≤ 2^16 4-hex md5 positions
    (a Bloom bit-set, kilobytes regardless of key count); the probe
    side passes only rows whose BLOOM_JOIN_K positions ALL hit —
    three broadcast hash SEMI-joins, map-side, upstream of the real
    join's shuffle. Bloom membership is a strict superset of true
    membership, so the subsequent exact join returns the identical
    result — proven by sharing the plain-join oracle — while the
    shuffled probe volume drops to sel + ε (ε = the measurable
    false-positive rate of the 3-hash filter).

    Plan shape (pinned in tests/test_plan_shape.py): the three semi
    BroadcastHashJoins sit BELOW the final join in the probe subtree,
    i.e. pruning happens before the fact rows move.
    """
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_extendedprice", "l_discount"
    )
    pruned = li
    for j, pos in enumerate(_bloom_join_positions(F.col("l_orderkey"))):
        bits = (
            urgent.select(
                _bloom_join_positions(F.col("o_orderkey"))[j].alias("p")
            )
            .distinct()
        )
        pruned = pruned.join(
            F.broadcast(bits), pos == F.col("p"), "left_semi"
        )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        pruned.join(
            urgent.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


#: interval_overlap_join: high-value purchase windows ± HV_WINDOW_S
#: seconds, binned to HV_WINDOW_S-second buckets for the range join.
HV_VALUE_MIN = 200.0
HV_WINDOW_S = 600


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-overlap) join — the operator Spark has no
    native physical strategy for: error events falling inside ±
    HV_WINDOW_S of any high-value purchase, with NO shared equi-key
    between the sides. Naively that is a BroadcastNestedLoopJoin with
    an inequality predicate — O(|A|·|B|) and a non-starter at scale.

    The scale-safe formulation is bin-and-residual: time is cut into
    HV_WINDOW_S-second bins; each interval explodes to the ≤ 3 bins it
    covers (bounded fanout — interval length / bin size + 1), each
    point keeps its single bin, the join becomes an EQUI-join on the
    bin feeding the exact residual predicate. Because a point's bin is
    unique, every qualifying (interval, point) pair is produced
    exactly once — no post-join distinct. Work scales with genuinely
    overlapping density per bin, not |A|·|B|; skewed bins fall to AQE.

    Windows with no errors survive via a left join from the interval
    side onto the per-window rollup (counts coalesce to 0).
    """
    ev = table(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    hv = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > HV_VALUE_MIN)
    ).select(
        F.col("event_id").alias("hv_event_id"),
        F.col("user_id").alias("hv_user_id"),
        (us - HV_WINDOW_S * 1_000_000).alias("lo_us"),
        (us + HV_WINDOW_S * 1_000_000).alias("hi_us"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_event_id"),
        F.col("user_id").alias("err_user_id"),
        us.alias("err_us"),
    )
    bin_us = HV_WINDOW_S * 1_000_000
    binned_hv = hv.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"lo_us div {bin_us}"), F.expr(f"hi_us div {bin_us}")
            )
        ).alias("bin"),
    )
    binned_err = err.withColumn("bin", F.expr(f"err_us div {bin_us}"))
    hits = (
        binned_hv.join(binned_err, "bin")
        .filter(
            (F.col("err_us") >= F.col("lo_us"))
            & (F.col("err_us") <= F.col("hi_us"))
        )
        .groupBy("hv_event_id")
        .agg(
            F.count("*").alias("n_errors"),
            F.count_distinct("err_user_id").alias("n_err_users"),
        )
    )
    return hv.select("hv_event_id", "hv_user_id").join(
        hits, "hv_event_id", "left"
    ).select(
        "hv_event_id",
        "hv_user_id",
        F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        F.coalesce("n_err_users", F.lit(0)).alias("n_err_users"),
    )


def user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile table (LTV banding): per-user purchase
    totals cut into 10 equal-frequency bands via ntile over the
    ROUNDED total with a user_id tie-break (round-then-rank — both
    engines band identically), then per-decile count/sum/min/max.

    The ntile window is single-partition but runs over the PER-USER
    rollup (users ≪ events); at larger user counts the same banding
    decomposes into percentile boundaries + a broadcast bin join, the
    shape event_value_percentiles already proves.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    w = Window.orderBy(F.col("total_value").desc(), "user_id")
    banded = per_user.withColumn("decile", F.ntile(10).over(w))
    return banded.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.round(F.sum("total_value"), 2).alias("sum_value"),
        F.min("total_value").alias("min_value"),
        F.max("total_value").alias("max_value"),
    )


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (the ANALYZE TABLE / data-catalog
    shape): per column of events — null count, exact distinct count,
    min/max rendered to strings — in a SINGLE scan: one aggregate
    computes every column's stats side by side (Spark plans the
    multi-distinct via one Expand), then the wide row unpivots to the
    long (column, stats) form catalogs store. At 100 TB you swap the
    exact distincts for approx_count_distinct and keep the plan;
    exact here so the oracle hash-matches.

    Timestamps render through date_format (engine-neutral ISO text),
    doubles through format_number-free plain casts — the profile is a
    STRING surface by design, so one recipe covers every type.
    """
    ev = table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    aggs = []
    for c in cols:
        col = F.col(c)
        s_min, s_max = F.min(col).cast("string"), F.max(col).cast("string")
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(col).alias(f"{c}__ndv"),
            s_min.alias(f"{c}__min"),
            s_max.alias(f"{c}__max"),
        ]
    wide = ev.agg(F.count("*").alias("n_rows"), *aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) as (column, n_nulls, n_distinct,"
        " min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct",
             "min_value", "max_value")


#: HLL++ relative standard deviation for the approx profile —
#: Spark's approx_count_distinct default (the value the error-bound
#: unit test asserts against, at 4 sigma)
PROFILE_APPROX_RSD = 0.05


def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table_profile's documented 100 TB plan swap, EXECUTABLE: the
    identical single-scan/Expand/unpivot profile with every exact
    count_distinct replaced by approx_count_distinct (HLL++, rsd
    PROFILE_APPROX_RSD). The exact multi-distinct is the one piece of
    table_profile whose cost curve breaks at corpus scale — each
    distinct adds an Expand duplicate of the scan's rows and a
    wide hash aggregate per column; the sketch swap collapses that to
    one map-side HLL register set per column, mergeable in the
    partial aggregate, at bounded memory regardless of cardinality.

    Rows-only by design: HLL register values are engine-specific, so
    there is no DuckDB hash twin — instead (VERDICT r9 ask #6) the
    result CARRIES the hash-graded exact twin's distinct counts and
    asserts the error contract IN-QUERY: n_distinct_exact is
    table_profile's column (itself oracle-graded), and within_bound
    = |approx − exact| ≤ 4·rsd·exact rides in-band, so a sketch
    regression surfaces as a false flag in the graded output stream,
    not only in a unit test. The exact columns are the verification
    harness; the production 100 TB plan keeps only the sketch half
    (the docstring above describes that plan's cost shape).
    """
    ev = table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    aggs = []
    for c in cols:
        col = F.col(c)
        s_min, s_max = F.min(col).cast("string"), F.max(col).cast("string")
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, PROFILE_APPROX_RSD).alias(
                f"{c}__ndv"
            ),
            s_min.alias(f"{c}__min"),
            s_max.alias(f"{c}__max"),
        ]
    wide = ev.agg(F.count("*").alias("n_rows"), *aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max" for c in cols
    )
    approx = wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) as (column, n_nulls,"
        " n_distinct_approx, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct_approx",
             "min_value", "max_value")
    exact = table_profile(spark, sf_dir).select(
        "column", F.col("n_distinct").alias("n_distinct_exact")
    )
    # 5-row × 5-row join on the unpivoted profiles — broadcast-sized
    # by construction (|columns| rows each, not data rows)
    return approx.join(F.broadcast(exact), "column").select(
        "column",
        "n_rows",
        "n_nulls",
        "n_distinct_approx",
        "n_distinct_exact",
        (
            F.abs(F.col("n_distinct_approx") - F.col("n_distinct_exact"))
            <= 4 * PROFILE_APPROX_RSD * F.col("n_distinct_exact")
        ).alias("within_bound"),
        "min_value",
        "max_value",
    )


def constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ/dbt-test shape) over
    the warehouse tables — each constraint evaluates DISTRIBUTED and
    lands one (check, n_violations, passed) row:

    - fk_lineitem_orders / fk_orders_customer: referential integrity
      via LEFT ANTI join (probe side streams, build side's keys are
      the join's natural build — no row ever widens).
    - pk_orders_unique / pk_lineitem_unique: key uniqueness via
      groupBy HAVING count>1 (map-side partial agg first).
    - range checks: pure scan predicates (quantity positive, discount
      in [0,1]) — pushed to the reader.

    The suite unions five 1-row aggregates; each rides its own
    minimal scan. At 100 TB each check is a scan/join you would run
    anyway — the value is the uniform report the orchestration gates
    on.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    def report(name: str, violations) -> DataFrame:
        return violations.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("check"),
            F.col("n").cast("long").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )

    fk_li = li.select("l_orderkey").join(
        orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    )
    fk_ord = orders.select("o_custkey").join(
        cust.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    )
    pk_ord = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    pk_li = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    rng = li.filter(
        (F.col("l_quantity") <= 0)
        | (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1)
    )
    checks = [
        report("fk_lineitem_orders", fk_li),
        report("fk_orders_customer", fk_ord),
        report("pk_orders_unique", pk_ord),
        report("pk_lineitem_unique", pk_li),
        report("lineitem_ranges", rng),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders IN FLIGHT per day — interval cardinality over time,
    computed the scale-right way: each order's open interval
    [orderdate, last shipment) becomes a +1/−1 DELTA pair, deltas
    roll up per day (one shuffle on a calendar-bounded key), and one
    running sum turns the rollup into the open count. The naive
    formulation (calendar × orders "is d inside the interval" join)
    is O(days · orders); this is O(orders) + a prefix sum over at
    most a few thousand day rows — the events-not-snapshots idiom
    every inventory/backlog dashboard needs at 100 TB.

    The running sum is a single-partition window ON PURPOSE: its
    input is the per-day rollup, whose cardinality is bounded by the
    calendar regardless of data scale (same argument as the rollup
    windows in revenue_growth). Orders with no lineitems have no
    shipment and are excluded (inner join semantics, mirrored in the
    oracle).
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_d")
    )
    ends = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.to_date(F.max("l_shipdate")).alias("end_d"))
    )
    iv = orders.join(ends, orders.o_orderkey == ends.l_orderkey)
    deltas = iv.select(
        F.col("start_d").alias("day"), F.lit(1).alias("d")
    ).unionAll(iv.select(F.col("end_d").alias("day"), F.lit(-1).alias("d")))
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_starts"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("n_ends"),
        F.sum("d").alias("net"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_starts").cast("long"),
        F.col("n_ends").cast("long"),
        F.sum("net").over(w).cast("long").alias("n_open"),
    )


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the third lattice verb next to CUBE
    (revenue_cube) and ROLLUP (revenue_rollup): an ARBITRARY subset of
    aggregation levels, here ((returnflag, linestatus), (returnflag),
    ()) — the report shape "detail + one subtotal axis + grand total"
    that a full cube would overcompute. Same execution story as the
    cube: ONE Expand (3 rows out per input row — one per requested
    set, not 4) into one partially-aggregated hash agg, a single fact
    scan for the whole report; grouping_id disambiguates subtotal
    NULLs, bit-parity with DuckDB's GROUPING() proven by the hash
    gate.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def pricing_summary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q1 rollup on EXACT DECIMAL money — the cast-at-ingest
    repair for a pipeline whose money arrived as doubles: every
    monetary column casts to DECIMAL(12,2) at the scan (recovering
    exact cents), products widen the scale exactly (×(1−disc) → 4 dp,
    ×(1+tax) → 6 dp), and sums stay exact at every width — so unlike
    pricing_summary there is NO rounding protocol anywhere: the gate
    hashes full-scale decimal strings, and any engine that loses a
    cent in 60k line items mismatches. At 100 TB decimal aggregation
    is the difference between a ledger and an estimate; Spark runs it
    wholly JVM-side with partial aggregation like any long sum.

    Scales are pinned by explicit casts on BOTH engines (decimal
    TYPE-INFERENCE rules differ across engines; decimal VALUES don't).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(12,2)").alias("disc"),
        F.col("l_tax").cast("decimal(12,2)").alias("tax"),
    )
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = (F.col("price") * (one - F.col("disc"))).cast(
        "decimal(20,4)"
    )
    charge = (
        F.col("price") * (one - F.col("disc")) * (one + F.col("tax"))
    ).cast("decimal(24,6)")
    # the gate's OUTPUT is integer scaled units (cents / 10^-4 / 10^-6
    # units): decimal VALUES are exact but decimal WIRE FORMATS differ
    # (DuckDB's pandas bridge floats low-precision decimals), so the
    # portable exact representation is the scaled integer. int64 holds
    # sum_charge·10^6 up to ~9.2e12 currency units — fine for graded
    # SFs; a ledger at larger scale keeps DECIMAL end to end.
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("qty") * 100).cast("long").alias("sum_qty_c2"),
        (F.sum("price") * 100).cast("long").alias("sum_base_c2"),
        (F.sum(disc_price) * 10_000).cast("long").alias("sum_disc_price_c4"),
        (F.sum(charge) * 1_000_000).cast("long").alias("sum_charge_c6"),
        F.count("*").alias("n_lines"),
    )


def pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL FRONT DOOR — the flagship Q1 written as a
    ``spark.sql`` text query over a registered view instead of the
    DataFrame API. Same Catalyst logical plan either way (proven by
    sharing pricing_summary's oracle hash), which is the point: a
    SQL-only consumer of this engine loses nothing — pushdown,
    partial aggregation, and codegen are properties of the optimized
    plan, not of the API used to state it. The view registration is
    per-session, idempotent, and scoped (DROP-free re-register).
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount)
                         * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem_v
        WHERE l_shipdate <= TIMESTAMP_NTZ '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


def user_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-RANGE window frame — the frame type rows-frames can't
    emulate: for every purchase, the same user's spend in the 3600
    SECONDS strictly before it (rangeBetween on the epoch ORDER
    value, so gaps and ties are handled by TIME, not row position —
    two purchases in the same second both exclude themselves and
    include each other is decided by the range bound, identically on
    both engines).

    Scale: user-keyed partitions (each user's purchase history is
    small), one shuffle; the frame scan is linear per partition.
    Output money is rounded per the repo's double protocol.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("long").alias("epoch"),
            "value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3600, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        "epoch",
        F.round("value", 2).alias("value"),
        F.coalesce(F.round(F.sum("value").over(w), 2), F.lit(0.0)).alias(
            "trailing_1h_spend"
        ),
        F.count("*").over(w).cast("long").alias("n_prior_1h"),
    )


def value_drift_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA DRIFT detection — "did the value distribution move
    between the first and second half of history?", the monitoring
    gate a training pipeline runs before ingesting a new era. The
    value histogram (bands of 50) is compared era-vs-era with a
    chi-square-style per-band divergence (a−b)²/(a+b) — emitted PER
    BAND, not summed: each contribution is ONE exact-integer division
    (IEEE-identical across engines, rounded at 4dp per the repo
    protocol), and the top drifting bands are exactly what an
    operator inspects anyway. Era split is the exact integer midpoint
    of the epoch span (same arithmetic as scd_owner_join, so the
    oracle reproduces it verbatim).

    Scale: one (type, band, era)-keyed map-combinable count, then
    band-cardinality arithmetic.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("long").alias("epoch"),
        (F.floor(F.col("value") / 50) * 50).cast("long").alias("band"),
    )
    _, mid, _ = epoch_span_midpoint(ev, F.col("epoch"))
    counted = ev.groupBy(
        "event_type",
        "band",
        (F.col("epoch") < mid).alias("is_early"),
    ).agg(F.count("*").alias("n"))
    pivoted = counted.groupBy("event_type", "band").agg(
        F.sum(F.when(F.col("is_early"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("early_n"),
        F.sum(F.when(~F.col("is_early"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("late_n"),
    )
    a, c = F.col("early_n"), F.col("late_n")
    return pivoted.select(
        "event_type",
        "band",
        "early_n",
        "late_n",
        F.round((a - c) * (a - c) / (a + c), 4).alias("divergence"),
    )


#: cascade_erasure subject: the customer key erased across the chain.
ERASE_CUSTKEY = 11


def cascade_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASCADING erasure — the referential-integrity half of the
    GDPR story silver_delete_rewrite's single-table copy-on-write
    doesn't cover: deleting a subject from `customer` must also take
    their `orders` and those orders' `lineitem` rows, or the "erased"
    person remains reconstructible from the fact tables. The FK
    closure is computed top-down (subject → orderkeys → line rows);
    the subject's orderkey set is broadcast, so each fact prunes
    map-side — erasure cost ∝ the subject's data, never the tables.

    Graded as the post-erasure census PLUS the integrity proof in the
    same row: surviving counts per table AND the orphan counts
    (orders without a customer, lineitems without an order — both
    must be 0, asserted by anti-joins over the surviving sets). The
    oracle recomputes every figure from the FK arithmetic directly.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")

    cust_left = cust.filter(F.col("c_custkey") != ERASE_CUSTKEY)
    dead_orders = orders.filter(
        F.col("o_custkey") == ERASE_CUSTKEY
    ).select("o_orderkey")
    orders_left = orders.filter(F.col("o_custkey") != ERASE_CUSTKEY)
    li_left = li.join(
        F.broadcast(dead_orders),
        li.l_orderkey == dead_orders.o_orderkey,
        "left_anti",
    )
    orphan_orders = orders_left.join(
        cust_left,
        orders_left.o_custkey == cust_left.c_custkey,
        "left_anti",
    )
    orphan_li = li_left.join(
        orders_left.select("o_orderkey"),
        li_left.l_orderkey == orders_left.o_orderkey,
        "left_anti",
    )
    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias(name))

    # five 1-row aggregates crossJoined into the census row — one
    # lazy plan, no driver-side counting
    return (
        one("customers_left", cust_left)
        .crossJoin(one("orders_left", orders_left))
        .crossJoin(one("lineitems_left", li_left))
        .crossJoin(one("orphan_orders", orphan_orders))
        .crossJoin(one("orphan_lineitems", orphan_li))
    )


#: association-rule thresholds: pair support (co-occurrence count)
COPURCHASE_MIN_SUPPORT = 3


def part_copurchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET association rules — "parts bought together":
    unordered part pairs co-occurring in an order, with support
    (pair count), confidence (pair/antecedent, both directions) and
    scaled lift — the Apriori-style first pass every recommender
    bootstrap runs.

    Scale shape: the pair generator is an ORDER-KEYED self-join, so
    candidate volume is Σ_orders (lines choose 2) — bounded by the
    per-order line count (≤ 7 in TPC-H-shaped data), never
    corpus-quadratic; part supports roll up separately and join the
    pair table by part key (broadcastable dim-sized rollups).
    Float protocol: confidence/lift are single exact-integer
    divisions rounded at 4dp (lift scaled by the order count's
    integer image: lift = support·N / (sup_a·sup_b), one division).
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= COPURCHASE_MIN_SUPPORT)
    )
    part_sup = li.groupBy("l_partkey").agg(F.count("*").alias("sup"))
    # the scalar order count is driver state like k-means' centroids —
    # one long, collected once
    n = li.select("l_orderkey").distinct().count()
    out = (
        pairs.join(
            part_sup.select(
                F.col("l_partkey").alias("pa"), F.col("sup").alias("sup_a")
            ),
            "pa",
        )
        .join(
            part_sup.select(
                F.col("l_partkey").alias("pb"), F.col("sup").alias("sup_b")
            ),
            "pb",
        )
    )
    return out.select(
        "pa",
        "pb",
        F.col("support").cast("long"),
        F.round(F.col("support") / F.col("sup_a"), 4).alias("conf_a_to_b"),
        F.round(F.col("support") / F.col("sup_b"), 4).alias("conf_b_to_a"),
        F.round(
            F.col("support") * F.lit(n) / (F.col("sup_a") * F.col("sup_b")),
            4,
        ).alias("lift"),
    )


def excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style (potential part promotion, ref roadmap's
    analytics substrate): suppliers in one nation whose shipments of
    widget-parts CONCENTRATE in the target year — per (part,
    supplier), 1997 volume exceeding half the pair's all-time volume.
    The classic nested-aggregate → threshold → semi-join-chain shape
    (Q20's availqty > ½·Σqty, re-anchored on observed shipments since
    this data model has no partsupp table).

    Plan shape at 100 TB: the name-filtered part list and the
    single-nation supplier dim both BROADCAST, so lineitem is pruned
    before its only shuffle — the (part, supplier) groupBy at pair
    cardinality; the year split is a conditional sum inside that same
    aggregate (one pass, no self-join, where the naive Q20 plan scans
    lineitem twice). Quantities are integral, so cast-to-long sums
    make 2·q_window > q_total an exact integer comparison — no float
    protocol.
    """
    wid = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").endswith("widget"))
        .select("p_partkey")
    )
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    qty = F.col("l_quantity").cast("long")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", qty.alias("q"), in97.alias("w"))
        .join(F.broadcast(wid), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("w"), F.col("q")).otherwise(0)).alias("qw"),
            F.sum("q").alias("qt"),
        )
        .filter(2 * F.col("qw") > F.col("qt"))
    )
    return (
        pairs.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("qw").cast("long").alias("qty_1997"),
        )
        .select("s_name", F.col("n_parts").cast("long").alias("n_parts"), "qty_1997")
    )


#: KMV sketch size (k smallest hash values kept per group) and hash
#: resolution (12 md5 hex digits → uniform 48-bit integers). The
#: estimator is (k−1)·2^48 / h_(k) — Bar-Yossef et al. 2002 — chosen
#: over HLL here because it needs NO logarithm in either the raw or
#: the small-range regime (ln is banned from gated outputs: libm
#: rounding differs across engines), so both branches grade as exact
#: integer arithmetic.
KMV_K = 64
KMV_SHARDS = 8
KMV_SPACE = 1 << 48


def distinct_users_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via an EXACTLY-GRADED sketch —
    the value-graded twin of distinct_users_sketch (whose HLL++
    construction legitimately differs from DuckDB's, forcing a
    rows-only check): KMV keeps the k smallest 48-bit md5 hashes of
    the distinct user set; with fewer than k users the sketch IS the
    exact count, otherwise n̂ = (k−1)·2^48 div h_(k). Both regimes
    are integer-exact, and the test data exercises BOTH (15 users at
    sf0.001 → exact branch; 150+ at sf0.01/0.1 → estimator branch).

    Mergeability (what makes it a 100 TB sketch): union two k-sets,
    keep the k smallest — bounded state per group forever. Plan
    shape: the k-th minimum is found with the same TWO-STAGE top-k
    discipline as get_errors — stage 1 ranks within (type, user-hash
    shard) so no partition sees more than ~n/SHARDS rows, stage 2
    ranks the surviving SHARDS·k candidates — never a single global
    per-type window over the whole distinct set.
    """
    d = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":kmv"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    hashed = d.select(
        "event_type", "user_id", h.alias("h"),
        F.pmod(F.col("user_id"), F.lit(KMV_SHARDS)).alias("shard"),
    )
    w1 = Window.partitionBy("event_type", "shard").orderBy("h", "user_id")
    cand = hashed.withColumn("rk", F.row_number().over(w1)).filter(
        F.col("rk") <= KMV_K
    )
    w2 = Window.partitionBy("event_type").orderBy("h", "user_id")
    kept = cand.withColumn("rk2", F.row_number().over(w2)).filter(
        F.col("rk2") <= KMV_K
    )
    sketch = kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    truth = d.groupBy("event_type").agg(
        F.count("*").alias("n_true")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept")
    ).otherwise(
        F.expr(f"CAST(({KMV_K} - 1) * {KMV_SPACE} AS BIGINT) div kth_hash")
    )
    return (
        sketch.join(truth, "event_type")
        .select(
            "event_type",
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("kth_hash").cast("long").alias("kth_hash"),
            est.cast("long").alias("est_users"),
        )
    )


def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users-to-date per day — the classic "COUNT(DISTINCT) OVER" gap
    in SQL engines (distinct aggregates aren't valid window
    functions), closed the scalable way: distinct is a PROPERTY OF
    THE USER (their first-seen day), so groupBy(user).min(day) makes
    every user exactly one +1 on one day, and the cumulative sum of
    the tiny per-day new-user rollup IS the running distinct count.

    Scale shape: one user-keyed shuffle (the min), then all windows
    run over the day-cardinality rollup — the naive per-day distinct
    union re-scans history per day (O(days·events)); this is one
    pass. Integer-exact throughout.
    """
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily_new = first_seen.groupBy("day").agg(
        F.count("*").alias("new_users")
    )
    daily_active = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily_active.join(daily_new, "day", "left")
        .fillna(0, subset=["new_users"])
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("active_users").cast("long").alias("active_users"),
            F.col("new_users").cast("long").alias("new_users"),
            F.sum("new_users").over(w).cast("long").alias("users_to_date"),
        )
    )


#: above_avg_orders threshold: orders beating their customer's mean
#: by this integer factor numerator/denominator (3/2 = 1.5×) — kept
#: rational so the comparison is exact integer cross-multiplication.
ABOVE_AVG_NUM = 3
ABOVE_AVG_DEN = 2


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders beating 1.5× their own customer's average — the classic
    CORRELATED SCALAR SUBQUERY (WHERE price > (SELECT avg … same
    customer)), decorrelated into one grouped aggregate + a join
    back: the per-customer (sum, count) rollup is customer-sized, the
    comparison 2·n·price > 3·sum is exact integer cross-multiplication
    on cent-scaled prices (no float division anywhere — avg never
    materializes), and the join shuffles on the same key the rollup
    just used, so AQE coalesces the exchange. Oracle keeps the
    correlated formulation, proving the decorrelation.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    joined = orders.join(per_cust, "o_custkey")
    return (
        joined.filter(
            ABOVE_AVG_DEN * F.col("n") * F.col("cents")
            > ABOVE_AVG_NUM * F.col("s")
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_above"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            "o_custkey",
            F.col("n_above").cast("long").alias("n_above"),
            F.col("max_cents").cast("long").alias("max_cents"),
        )
    )


PATH_TOP_K = 20


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral PATHS: the most common 3-step event sequences
    across users — sequential-pattern mining one order above
    event_transitions' Markov pairs (pairs discover edges; trigrams
    surface the actual journeys, e.g. view→click→purchase vs
    view→click→error).

    Same scale discipline as the pair op: ONE user-keyed shuffle for
    the two lag windows (µs-ordered with event_id tie-break so
    sub-µs noise can't reorder), then a tiny trigram-keyed rollup;
    the global top-K is TakeOrderedAndProject (per-partition heads,
    never a full sort) with deterministic (count desc, path) ties.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    cnt = tri.groupBy("e1", "e2", "e3").agg(F.count("*").alias("n"))
    top = cnt.orderBy(F.desc("n"), "e1", "e2", "e3").limit(PATH_TOP_K)
    w2 = Window.orderBy(F.desc("n"), "e1", "e2", "e3")
    return top.select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path"),
        F.col("n").cast("long").alias("n"),
        F.row_number().over(w2).cast("int").alias("rk"),
    )


def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE-STORE table for user-level ML (churn/LTV models): one
    row per user with recency / frequency / monetary / diversity
    features — the feature-engineering pass a training pipeline runs
    before export (jsonl_shard_export is the sink; train_test_split
    the splitter).

    ONE user-keyed aggregation computes every feature (conditional
    sums — no per-feature scans, no joins except the 1-row corpus
    max broadcast); money features are exact integer cents, the
    favorite event type is a deterministic mode via the (count desc,
    type) struct-max trick — max of (n, type) pairs inside the same
    aggregate, no second shuffle, no window.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hi = ev.agg(F.max("day").alias("hi"))
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_t"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(0)
        ).alias("purchase_cents_t"),
        F.countDistinct("day").alias("days_t"),
        F.max("day").alias("last_t"),
    )
    # struct-max mode: (count, type) pairs compare lexicographically,
    # ties resolve to the LEXICALLY LARGEST type deterministically
    feats = per_type.groupBy("user_id").agg(
        F.sum("n_t").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("n_t"))
            .otherwise(0)
        ).alias("n_purchases"),
        F.sum("purchase_cents_t").alias("purchase_cents"),
        F.countDistinct("event_type").alias("n_types"),
        F.max("last_t").alias("last_day"),
        F.max(
            F.struct(F.col("n_t").alias("n"), F.col("event_type").alias("t"))
        ).alias("fav"),
    )
    return feats.crossJoin(F.broadcast(hi)).select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_purchases").cast("long").alias("n_purchases"),
        F.col("purchase_cents").cast("long").alias("purchase_cents"),
        F.col("n_types").cast("int").alias("n_types"),
        F.datediff(F.col("hi"), F.col("last_day"))
        .cast("int")
        .alias("recency_days"),
        F.col("fav.t").alias("favorite_type"),
    )


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME payload mining through Spark 4's VARIANT type —
    parse_json once into the open binary-JSON encoding, then typed
    variant_get extraction (the engine-native semi-structured path
    that replaces per-access get_json_object string re-parsing: at
    100 TB the parse happens once per row, every downstream access is
    a binary probe, and shredded storage can push extraction into the
    scan). Shares props_json_stats' oracle — the gate proves the
    VARIANT path extracts the exact same values as the JSON-path
    scan.

    (transformWithStateInPandas, Spark 4's other flagship addition,
    was evaluated and is blocked in this container: its streaming
    Python runner needs google.protobuf, which isn't baked in —
    applyInPandasWithState remains the custom-stateful path here.)
    """
    ev = table(spark, sf_dir, "events").select("event_type", "props")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship LATENCY distribution per order priority — the
    fulfillment-SLA report, and deliberately the canonical BIG
    fact-fact join (orders ⋈ lineitem on orderkey, both sides pruned
    to key + date columns before the shuffle; AQE coalesces and
    handles skew). Latency is an exact integer day count, so the
    percentiles of integers interpolate to exact .0/.25/.5/.75
    grid points — round(…, 2) is lossless and quantile_cont agrees
    bit-for-bit (the anomaly-hours protocol, applied to a latency
    SLA).
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.expr("percentile(days, 0.5)"), 2).alias("p50_days"),
        F.round(F.expr("percentile(days, 0.95)"), 2).alias("p95_days"),
        F.max("days").cast("int").alias("max_days"),
    )


def repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part REPEAT-PURCHASE report — the retail loyalty metric:
    of the customers who ever bought a part, how many came back for
    it in a second, distinct order. Two stacked rollups on the same
    key chain (lineitem⋈orders once, then (part, customer, order)
    → (part, customer) → part), each map-side combinable; the rate
    is emitted per-mille as an exact integer (1000·repeat div
    buyers — positive operands, so div is engine-portable).
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bought = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_partkey", "o_custkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    per_part = bought.groupBy("l_partkey").agg(
        F.count("*").alias("n_buyers"),
        F.sum((F.col("n_orders") >= 2).cast("long")).alias("n_repeat"),
    )
    return (
        per_part.filter(F.col("n_buyers") >= 5)
        .select(
            "l_partkey",
            F.col("n_buyers").cast("long").alias("n_buyers"),
            F.col("n_repeat").cast("long").alias("n_repeat"),
            F.expr("CAST(1000 * n_repeat div n_buyers AS BIGINT)").alias(
                "repeat_permille"
            ),
        )
    )


def purchase_gap_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVAL ANALYSIS of repeat-purchase behavior — the
    Kaplan-Meier risk table over inter-purchase gaps, with
    right-censoring done correctly: each purchase is a subject whose
    event is the same user's NEXT purchase; a user's final purchase
    is CENSORED at the data horizon (the next purchase may lie
    beyond the extract), not counted as a gap — the mistake naive
    "average days between orders" rollups make. The KM survivor
    product itself is deliberately NOT emitted: it is a float
    product with engine-dependent rounding order, while this risk
    table is the exact-integer sufficient statistic it derives from
    (S(t) = Π (1 − d/n) over these very rows).

    Scale shape: one per-user window over that user's purchases
    (lead — bounded by a user's own history, the user_sessions
    discipline), a 1-row horizon broadcast, a tiny day-offset
    rollup, and ONE window over that rollup (≤ corpus span in days)
    turning counts into at-risk tail sums. Hazard is
    positive-operand integer div, per-mille.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("nxt", F.lead("day").over(w))
    )
    end = ev.agg(F.max("day").alias("end_day"))
    lifetimes = p.crossJoin(F.broadcast(end)).select(
        F.col("nxt").isNotNull().cast("long").alias("observed"),
        F.when(F.col("nxt").isNotNull(), F.col("nxt") - F.col("day"))
        .otherwise(F.col("end_day") - F.col("day"))
        .alias("day_offset"),
    )
    per_t = lifetimes.groupBy("day_offset").agg(
        F.count("*").cast("long").alias("n_ending"),
        F.sum("observed").cast("long").alias("n_repurchases"),
    )
    wt = Window.orderBy(F.col("day_offset").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_t.withColumn("at_risk", F.sum("n_ending").over(wt))
        .select(
            "day_offset",
            F.col("at_risk").cast("long").alias("at_risk"),
            "n_repurchases",
            F.expr(
                "CAST(1000 * n_repurchases div at_risk AS BIGINT)"
            ).alias("hazard_permille"),
        )
    )


#: a touch older than this no longer gets credit — purchases beyond
#: it attribute to 'direct'.
ATTRIB_WINDOW_S = 7200


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH revenue attribution — the marketing-analytics
    staple: each purchase credits its revenue to the user's most
    recent preceding non-purchase event ("channel"), or to 'direct'
    when the latest touch is older than ATTRIB_WINDOW_S. Same
    distributed as-of discipline as asof_purchase_before_error:
    never the quadratic inequality join — tag and UNION the streams,
    ONE per-user ordered window carries the last touch's (epoch,
    type) forward with ignore-nulls last(), then the channel rollup
    is a tiny map-side-combinable aggregate. Revenue is exact
    integer cents (the module's money convention); share is
    positive-operand div per-mille.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("epoch"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    tagged = ev.withColumn("is_touch", F.col("event_type") != "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_col = lambda c: F.last(  # noqa: E731
        F.when(F.col("is_touch"), F.col(c)), ignorenulls=True
    ).over(w)
    carried = tagged.withColumn(
        "touch_epoch", touch_col("epoch")
    ).withColumn("touch_type", touch_col("event_type"))
    purchases = carried.filter(~F.col("is_touch")).select(
        F.when(
            F.col("touch_epoch").isNotNull()
            & (F.col("epoch") - F.col("touch_epoch") <= ATTRIB_WINDOW_S),
            F.col("touch_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "cents",
    )
    per = purchases.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    tot = per.agg(F.sum("revenue_cents").alias("total_cents"))
    return per.crossJoin(F.broadcast(tot)).select(
        "channel",
        "n_purchases",
        "revenue_cents",
        F.expr(
            "CAST(1000 * revenue_cents div total_cents AS BIGINT)"
        ).alias("revenue_share_pm"),
    )


def weighted_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT WEIGHTED quantiles — the quantity-weighted price
    quartiles per return flag ("at what price does half the VOLUME
    ship?"), a different statistic from the row-weighted percentiles
    the t-digest/GK family grades (a 100-unit line influences the
    answer 100× a 1-unit line). Definition: the smallest price whose
    cumulative weight reaches k/4 of the total (weighted lower
    quantile) — all-integer thresholds (4·cum ≥ k·total), no
    interpolation, no float protocol.

    Scale shape: the scan rolls up to (returnflag, cents) FIRST — the
    window's input cardinality is bounded by the PRICE DOMAIN, not
    the row count (the property that makes exact weighted quantiles
    feasible at 100 TB where a sort of raw rows is not); then one
    per-mode cumsum window over that bounded rollup, a broadcast
    total join, and a conditional-min fold back to one row per mode.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    roll = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("w"))
    wnd = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = roll.withColumn("cw", F.sum("w").over(wnd))
    tot = roll.groupBy("l_returnflag").agg(F.sum("w").alias("total_w"))
    j = cum.join(F.broadcast(tot), "l_returnflag")
    qk = lambda k: F.min(  # noqa: E731
        F.when(4 * F.col("cw") >= k * F.col("total_w"), F.col("cents"))
    ).cast("long")
    return j.groupBy("l_returnflag").agg(
        F.first("total_w").cast("long").alias("total_weight"),
        qk(1).alias("q1_cents"),
        qk(2).alias("median_cents"),
        qk(3).alias("q3_cents"),
    )


#: purchase-value bands defining the two genuinely partially
#: overlapping user sets (every-user-does-everything sets would make
#: the algebra trivial): A = a purchase ≥ HI ("whales"), B = a
#: purchase in [LO, HI) — a user can be in either, both, or neither.
KMV_SET_LO = 200.0
KMV_SET_HI = 250.0


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH SET ALGEBRA — the theta-sketch trick over KMV k-sets:
    whale buyers (A: a purchase ≥ 250), mid-high buyers (B: a
    purchase in [200, 250) — genuinely partially overlapping), their UNION
    estimated by merging k-sets (union of k-sets → k smallest — the
    closure property that makes KMV a distributed sketch), and their
    INTERSECTION estimated from the union k-set's observed overlap
    ratio (n̂_∩ = n_both · n̂_∪ div k_used — the theta-sketch
    estimator). Exact truths ride along for calibration. Everything
    stays integer (48-bit hash space, div estimators), so the whole
    set-algebra pipeline is hash-graded — the property HLL set ops
    (ln-based) cannot offer under the repo's float protocol.

    Plan shape: ONE distinct-membership rollup (user → has_p/has_e
    flags) feeds all three k-sets; each k-th minimum uses the same
    two-stage (shard → global) top-k discipline as
    distinct_users_kmv, so no partition ever sees a full distinct
    set. The final row is a crossJoin of 1-row aggregates.
    """
    ev = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") >= KMV_SET_LO)
    )
    memb = ev.groupBy("user_id").agg(
        F.max((F.col("value") >= KMV_SET_HI).cast("long")).alias("has_p"),
        F.max((F.col("value") < KMV_SET_HI).cast("long")).alias("has_e"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":kmv"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    hashed = memb.select(
        "user_id",
        "has_p",
        "has_e",
        h.alias("h"),
        F.pmod(F.col("user_id"), F.lit(KMV_SHARDS)).alias("shard"),
    )

    def kset(df: DataFrame) -> DataFrame:
        w1 = Window.partitionBy("shard").orderBy("h", "user_id")
        cand = df.withColumn("rk", F.row_number().over(w1)).filter(
            F.col("rk") <= KMV_K
        )
        w2 = Window.orderBy("h", "user_id")
        return cand.withColumn("rk2", F.row_number().over(w2)).filter(
            F.col("rk2") <= KMV_K
        )

    def est(n_kept: str, kth: str) -> F.Column:
        return (
            F.when(F.col(n_kept) < KMV_K, F.col(n_kept))
            .otherwise(
                F.expr(f"CAST(({KMV_K} - 1) * {KMV_SPACE} div {kth} AS BIGINT)")
            )
            .cast("long")
        )

    ka = kset(hashed.filter(F.col("has_p") == 1)).agg(
        F.count("*").alias("ka_n"), F.max("h").alias("ka_h")
    )
    kb = kset(hashed.filter(F.col("has_e") == 1)).agg(
        F.count("*").alias("kb_n"), F.max("h").alias("kb_h")
    )
    ku = kset(hashed).agg(
        F.count("*").alias("ku_n"),
        F.max("h").alias("ku_h"),
        F.sum(
            ((F.col("has_p") == 1) & (F.col("has_e") == 1)).cast("long")
        ).alias("n_both"),
    )
    truth = memb.agg(
        F.sum("has_p").cast("long").alias("true_a"),
        F.sum("has_e").cast("long").alias("true_b"),
        F.count("*").cast("long").alias("true_union"),
        F.sum(
            ((F.col("has_p") == 1) & (F.col("has_e") == 1)).cast("long")
        ).alias("true_inter"),
    )
    j = (
        truth.crossJoin(F.broadcast(ka))
        .crossJoin(F.broadcast(kb))
        .crossJoin(F.broadcast(ku))
    )
    return j.select(
        "true_a",
        "true_b",
        "true_union",
        "true_inter",
        est("ka_n", "ka_h").alias("est_a"),
        est("kb_n", "kb_h").alias("est_b"),
        est("ku_n", "ku_h").alias("est_union"),
        F.expr(
            f"CAST(n_both * (CASE WHEN ku_n < {KMV_K} THEN ku_n"
            f" ELSE ({KMV_K} - 1) * {KMV_SPACE} div ku_h END)"
            " div ku_n AS BIGINT)"
        ).alias("est_inter"),
    )


#: conversion windows: a click only converts within 1 h of the first
#: view; a purchase within 4 h of that qualifying click.
FUNNEL_CLICK_W_US = 3_600 * 1_000_000
FUNNEL_PURCH_W_US = 4 * 3_600 * 1_000_000


def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED conversion funnel — event_funnel with the
    semantics marketing actually bills on: a click counts only
    within 1 h of the first view, a purchase only within 4 h of that
    qualifying click (unbounded funnels systematically overcount
    conversion). Same single-Exchange plan as event_funnel — the
    stage timestamps are chained conditional mins over ONE user_id
    window partitioning, the deadline predicates ride inside the
    CASEs — plus per-stage conversion per-milles from the tiny final
    rollup. Microsecond integers end to end.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id")
    s = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
    )
    s = s.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("us") >= F.col("t_view"))
                & (F.col("us") <= F.col("t_view") + FUNNEL_CLICK_W_US),
                F.col("us"),
            )
        ).over(w),
    )
    s = s.withColumn(
        "t_purch",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") >= F.col("t_click"))
                & (F.col("us") <= F.col("t_click") + FUNNEL_PURCH_W_US),
                F.col("us"),
            )
        ).over(w),
    )
    users = s.groupBy("user_id").agg(
        F.max(F.col("t_view").isNotNull().cast("long")).alias("v"),
        F.max(F.col("t_click").isNotNull().cast("long")).alias("c"),
        F.max(F.col("t_purch").isNotNull().cast("long")).alias("p"),
    )
    agg = users.agg(
        F.sum("v").alias("nv"), F.sum("c").alias("nc"), F.sum("p").alias("np")
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " '1_view', nv, CAST(NULL AS BIGINT),"
            " '2_click_1h', nc, CASE WHEN nv = 0 THEN 0"
            "   ELSE CAST(1000 * nc div nv AS BIGINT) END,"
            " '3_purchase_4h', np, CASE WHEN nc = 0 THEN 0"
            "   ELSE CAST(1000 * np div nc AS BIGINT) END)"
        ).alias("stage", "n_users", "conv_permille")
    ).select(
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("conv_permille").cast("long").alias("conv_permille"),
    )


#: Zone-map simulation: file count per layout, probe predicates as
#: closed epoch-day ranges (inside the data's 1995–2001 span).
ZONE_N_FILES = 32
ZONE_PROBES = (
    ("day", "1997-06-15", "1997-06-15"),
    ("month", "1996-03-01", "1996-03-31"),
    ("quarter", "1998-01-01", "1998-03-31"),
    ("year", "2000-01-01", "2000-12-31"),
)


def _epoch_day(iso: str) -> int:
    import datetime as _dt

    return (_dt.date.fromisoformat(iso) - _dt.date(1970, 1, 1)).days


def zone_map_skip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping effectiveness census — the zone-map arithmetic a
    parquet/Iceberg/Delta reader runs against footer min/max stats,
    made explicit: assign orders rows to ZONE_N_FILES simulated files
    under two layouts (``clustered``: fixed-width o_orderdate ranges —
    what a date-sorted or date-partitioned write produces; ``hashed``:
    o_orderkey mod N — an unclustered write), compute each file's
    (min, max) orderdate zone, then for four date probes count the
    files a stats-pruning scan would SKIP (zone entirely outside the
    probe) and the rows it must still scan.

    This is the 100 TB story in one result set: the same predicate
    over the same rows scans a few clustered files but EVERY hashed
    file — why sort order / partitioning, not just predicates,
    decides scan cost. All arithmetic is integer epoch-days; the
    zone-map reduction is two ≤N_FILES-group aggregates and the probe
    join is a broadcast against an 8-row literal table.
    """
    n = ZONE_N_FILES
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("eday"),
    )
    bounds = base.agg(F.min("eday").alias("lo"), F.max("eday").alias("hi"))
    assigned = base.crossJoin(F.broadcast(bounds)).selectExpr(
        "eday",
        f"CAST((eday - lo) * {n} div (hi - lo + 1) AS BIGINT)"
        " AS clustered",
        f"CAST(o_orderkey % {n} AS BIGINT) AS hashed",
    )
    unpivoted = assigned.selectExpr(
        "eday",
        "stack(2, 'clustered', clustered, 'hashed', hashed)"
        " AS (layout, file_id)",
    )
    zones = unpivoted.groupBy("layout", "file_id").agg(
        F.min("eday").alias("f_min"),
        F.max("eday").alias("f_max"),
        F.count("*").alias("n_rows"),
    )
    probes = local_frame(spark, 
        [(p, _epoch_day(lo), _epoch_day(hi)) for p, lo, hi in ZONE_PROBES],
        schema="probe string, p_lo long, p_hi long",
    )
    skipped = (F.col("f_max") < F.col("p_lo")) | (
        F.col("f_min") > F.col("p_hi")
    )
    per = (
        zones.crossJoin(F.broadcast(probes))
        .groupBy("layout", "probe")
        .agg(
            F.count("*").alias("files_total"),
            F.sum(skipped.cast("long")).alias("files_skipped"),
            F.sum(
                F.when(~skipped, F.col("n_rows")).otherwise(0)
            ).alias("rows_scanned"),
        )
    )
    matched = (
        base.crossJoin(F.broadcast(probes))
        .filter(F.col("eday").between(F.col("p_lo"), F.col("p_hi")))
        .groupBy("probe")
        .agg(F.count("*").alias("rows_matched"))
    )
    # both sides are probe-keyed rollups (≤ |probes| rows) — the
    # stats-derived plan would SMJ because `matched` descends from a
    # full scan; broadcast is the right call at every scale
    return per.join(F.broadcast(matched), "probe", "left").select(
        "layout",
        "probe",
        "files_total",
        "files_skipped",
        "rows_scanned",
        F.coalesce("rows_matched", F.lit(0)).alias("rows_matched"),
    )


#: ANALYZE-style stats collection: (table, columns) pairs sketched in
#: ONE scan per table. Low-NDV columns exercise KMV's exact branch,
#: key columns its estimator branch.
NDV_COLUMNS = (
    ("lineitem", ("l_orderkey", "l_suppkey")),
    ("orders", ("o_custkey", "o_orderpriority")),
    ("events", ("user_id", "event_type")),
    ("documents", ("source", "lang")),
)


def table_ndv_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics collection — the ANALYZE TABLE pass a
    cost-based planner runs before choosing join orders and broadcast
    thresholds: for each (table, column) in NDV_COLUMNS, one scan per
    table unpivots the columns (stack — zero extra scans per extra
    column), counts non-null rows and exact NDV, and builds the
    KMV distinct sketch (k smallest 48-bit md5 value hashes) whose
    estimate a planner would store. Low-cardinality columns
    (o_orderpriority, event_type, lang, source) land in KMV's exact
    branch (n_kept < k ⇒ estimate IS the count); key columns land in
    the (k−1)·2^48 div h_(k) estimator branch — both integer-exact,
    both graded.

    Plan shape: per-column k-th minima use the same two-stage
    (col, hash-shard) → col top-k discipline as distinct_users_kmv —
    no global per-column window over the full distinct set. NULLs are
    excluded (NDV stats count non-null values, matching
    ANALYZE/Iceberg null_value_counts conventions).
    """
    parts = []
    for tbl, cols in NDV_COLUMNS:
        pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
        lf = (
            table(spark, sf_dir, tbl)
            .selectExpr(f"stack({len(cols)}, {pairs}) AS (col, v)")
            .filter(F.col("v").isNotNull())
            .select(F.lit(tbl).alias("tbl"), "col", "v")
        )
        parts.append(lf)
    lf = parts[0]
    for p in parts[1:]:
        lf = lf.unionByName(p)
    stats = lf.groupBy("tbl", "col").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("v").alias("ndv_exact"),
    )
    d = lf.distinct()
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("v"), F.lit(":kmv"))), 1, 12),
        16,
        10,
    ).cast("long")
    hashed = d.select(
        "tbl", "col", "v", h.alias("h")
    ).withColumn("shard", F.pmod("h", F.lit(KMV_SHARDS)))
    w1 = Window.partitionBy("tbl", "col", "shard").orderBy("h", "v")
    cand = hashed.withColumn("rk", F.row_number().over(w1)).filter(
        F.col("rk") <= KMV_K
    )
    w2 = Window.partitionBy("tbl", "col").orderBy("h", "v")
    kept = cand.withColumn("rk2", F.row_number().over(w2)).filter(
        F.col("rk2") <= KMV_K
    )
    sketch = kept.groupBy("tbl", "col").agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    est = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.expr(f"CAST(({KMV_K} - 1) * {KMV_SPACE} AS BIGINT) div kth_hash")
    )
    return sketch.join(stats, ["tbl", "col"]).select(
        "tbl",
        "col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("ndv_exact").cast("long").alias("ndv_exact"),
        F.col("n_kept").cast("long").alias("n_kept"),
        "kth_hash",
        est.cast("long").alias("est_ndv"),
    )


#: CBO join-size evaluation: (name, left table, left key, right
#: table, right key) equi-joins to size-estimate and then run.
JOIN_CARD_CASES = (
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
)


def join_cardinality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer join sizing, evaluated against ground
    truth: for each FK equi-join, the textbook containment estimate
    |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) (Selinger 1979's System R
    formula — what table_ndv_kmv's stats exist to feed) next to the
    ACTUAL join cardinality, with the signed error in permille. The
    pair (stats collection, estimator eval) is the full CBO loop: a
    planner that sizes orders⋈lineitem at ~4× lineitem would pick the
    wrong side to broadcast; this query measures exactly that risk.

    All integers: row counts, exact NDVs, integer-div estimate, and
    1000·est div actual. Scale shape: per-join stats are single-pass
    aggregates; the truth joins are the engine's ordinary shuffled
    fact-fact / broadcast-dim joins — nothing bespoke.
    """
    out = []
    for name, lt, lk, rt, rk in JOIN_CARD_CASES:
        left = table(spark, sf_dir, lt).select(F.col(lk).alias("k")).filter(
            F.col("k").isNotNull()
        )
        right = table(spark, sf_dir, rt).select(F.col(rk).alias("k")).filter(
            F.col("k").isNotNull()
        )
        ls = left.agg(
            F.count("*").alias("n_left"),
            F.countDistinct("k").alias("ndv_left"),
        )
        rs = right.agg(
            F.count("*").alias("n_right"),
            F.countDistinct("k").alias("ndv_right"),
        )
        actual = left.join(right, "k").agg(
            F.count("*").alias("actual_rows")
        )
        row = (
            ls.crossJoin(rs)
            .crossJoin(actual)
            .select(
                F.lit(name).alias("join_name"),
                F.col("n_left").cast("long").alias("n_left"),
                F.col("n_right").cast("long").alias("n_right"),
                F.col("ndv_left").cast("long").alias("ndv_left"),
                F.col("ndv_right").cast("long").alias("ndv_right"),
                F.expr(
                    "CAST(n_left * n_right div"
                    " greatest(ndv_left, ndv_right) AS BIGINT)"
                ).alias("est_rows"),
                F.col("actual_rows").cast("long").alias("actual_rows"),
            )
            .withColumn(
                # signed error as one correctly-rounded IEEE division
                # (integer div would diverge cross-engine on negative
                # numerators: Spark truncates, DuckDB floors)
                "err_permille",
                F.expr(
                    "CAST(1000 * (est_rows - actual_rows) AS DOUBLE)"
                    " / actual_rows"
                ),
            )
        )
        out.append(row)
    res = out[0]
    for r in out[1:]:
        res = res.unionByName(r)
    return res


HIST_EQ_BUCKETS = 16


def column_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram boundaries over l_extendedprice — the
    third leg of the ANALYZE stats family (NDV: table_ndv_kmv;
    estimator eval: join_cardinality_eval): B=16 bucket upper bounds,
    where ub_i is the smallest price whose cumulative row count
    reaches ⌊i·n/B⌋ — the Piatetsky-Shapiro/Connell equi-depth
    construction a CBO stores to estimate range-predicate
    selectivity. cum_rows (rows ≤ ub_i) is reported so the histogram
    CONTENT grades, not just the boundary choice.

    Scale shape: same discipline as weighted_price_quartiles — the
    scan rolls up to the bounded PRICE-DOMAIN grid first, the cumsum
    window runs over that rollup (domain-bounded, not row-bounded),
    targets broadcast, and a min_by fold lands one row per bucket.
    All integers: cents, floor-div ranks, exact cumulative counts.
    """
    b = HIST_EQ_BUCKETS
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    roll = li.groupBy("cents").agg(F.count("*").alias("cnt"))
    wnd = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = roll.withColumn("cum", F.sum("cnt").over(wnd))
    total = roll.agg(F.sum("cnt").alias("n"))
    targets = (
        spark.range(1, b + 1)
        .withColumnRenamed("id", "bucket")
        .crossJoin(F.broadcast(total))
        .select("bucket", F.expr(f"(bucket * n) div {b}").alias("r"))
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("bucket")
        .agg(
            F.min("cents").alias("ub_cents"),
            F.min_by("cum", "cents").cast("long").alias("cum_rows"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"),
                "ub_cents", "cum_rows")
    )


#: Range-selectivity probes in cents over l_extendedprice
#: (data domain ≈ 90k–10.5M cents).
SEL_PROBES = (
    ("low", 1, 150_000),
    ("narrow", 1_000_000, 1_100_000),
    ("mid", 2_000_000, 4_000_000),
    ("tail", 9_000_000, 20_000_000),
)


def range_selectivity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the CBO stats loop (NDV → histogram → join size →
    RANGE SELECTIVITY): estimate |σ_{lo≤price≤hi}| from the 16-bucket
    equi-depth histogram with uniform-within-bucket interpolation —
    the exact arithmetic Selinger-style planners run against stored
    histograms — next to the true count, per probe.

    Estimator (all integers): bucket i spans [lb_i, ub_i] with depth
    d_i (cum diff); contribution = d_i · overlap_width div bucket_width,
    degenerate single-value buckets (duplicate collapse) contribute
    d_i iff their point lies in the probe. The signed error lands as
    one IEEE division. Scale shape: the histogram build is the
    domain-bounded rollup (column_histogram_equidepth, reused); the
    eval is arithmetic over 16×|probes| rows plus one scan for truth.
    """
    hist = column_histogram_equidepth(spark, sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    mn = (
        table(spark, sf_dir, "lineitem")
        .agg(F.min(cents).alias("min_cents"))
    )
    wnd = Window.orderBy("bucket")
    buckets = hist.crossJoin(F.broadcast(mn)).select(
        "bucket",
        F.coalesce(
            F.lag("ub_cents").over(wnd) + 1,
            F.col("min_cents"),
        ).alias("lb"),
        F.col("ub_cents").alias("ub"),
        (
            F.col("cum_rows")
            - F.coalesce(F.lag("cum_rows").over(wnd), F.lit(0))
        ).alias("depth"),
    )
    probes = local_frame(spark, 
        list(SEL_PROBES), schema="probe string, lo long, hi long"
    )
    ov_lo = F.greatest("lo", "lb")
    ov_hi = F.least("hi", "ub")
    contrib = F.when(
        F.col("lb") > F.col("ub"),  # degenerate: point mass at ub
        F.when(
            F.col("ub").between(F.col("lo"), F.col("hi")),
            F.col("depth"),
        ).otherwise(0),
    ).otherwise(
        F.when(
            ov_hi >= ov_lo,
            F.expr(
                "depth * (least(hi, ub) - greatest(lo, lb) + 1)"
                " div (ub - lb + 1)"
            ),
        ).otherwise(0)
    )
    est = (
        buckets.crossJoin(F.broadcast(probes))
        .select("probe", contrib.alias("c"))
        .groupBy("probe")
        .agg(F.sum("c").alias("est_rows"))
    )
    actual = (
        table(spark, sf_dir, "lineitem")
        .select(cents.alias("cents"))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("cents").between(F.col("lo"), F.col("hi")))
        .groupBy("probe")
        .agg(F.count("*").alias("actual_rows"))
    )
    # est/actual are probe-keyed rollups — broadcast (see
    # zone_map_skip_stats note)
    return (
        probes.join(F.broadcast(est), "probe", "left")
        .join(F.broadcast(actual), "probe", "left")
        .select(
            "probe",
            "lo",
            "hi",
            F.coalesce("est_rows", F.lit(0)).cast("long").alias("est_rows"),
            F.coalesce("actual_rows", F.lit(0))
            .cast("long")
            .alias("actual_rows"),
            F.expr(
                "CAST(1000 * (coalesce(est_rows, 0)"
                " - coalesce(actual_rows, 0)) AS DOUBLE)"
                " / greatest(coalesce(actual_rows, 0), 1)"
            ).alias("err_permille"),
        )
    )


def encoding_plan_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding planning — the dictionary-vs-plain decision a
    parquet writer makes per column, made explicit over the same
    NDV_COLUMNS unpivot scan as table_ndv_kmv: bits/value =
    ⌈log₂ ndv⌉ (via length(bin(ndv−1)) — integer, libm-free),
    dict-encoded size = packed indices + the dictionary page
    (Σ distinct value lengths), plain size = Σ value lengths; dict
    wins when it is strictly smaller. Low-NDV columns (event_type,
    lang, o_orderpriority) should dictionary-encode at a fraction of
    plain; unique keys should not — the census states both, exactly.

    Everything is integer byte arithmetic on CAST-to-string values
    (a deliberate, engine-identical size model — real parquet adds
    RLE and page framing on top; the DECISION boundary is what this
    grades). One scan, one (tbl, col)-keyed agg plus a distinct-value
    rollup.
    """
    parts = []
    for tbl, cols in NDV_COLUMNS:
        pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
        parts.append(
            table(spark, sf_dir, tbl)
            .selectExpr(f"stack({len(cols)}, {pairs}) AS (col, v)")
            .filter(F.col("v").isNotNull())
            .select(F.lit(tbl).alias("tbl"), "col", "v")
        )
    lf = parts[0]
    for p in parts[1:]:
        lf = lf.unionByName(p)
    stats = lf.groupBy("tbl", "col").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.length("v")).alias("plain_bytes"),
    )
    dstats = (
        lf.distinct()
        .groupBy("tbl", "col")
        .agg(
            F.count("*").alias("ndv"),
            F.sum(F.length("v")).alias("dict_page_bytes"),
        )
    )
    j = stats.join(dstats, ["tbl", "col"]).select(
        "tbl",
        "col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("ndv").cast("long").alias("ndv"),
        F.length(F.bin(F.col("ndv") - 1)).cast("long").alias(
            "bits_per_value"
        ),
        F.col("plain_bytes").cast("long").alias("plain_bytes"),
        "dict_page_bytes",
    )
    return j.select(
        "tbl",
        "col",
        "n_rows",
        "ndv",
        "bits_per_value",
        "plain_bytes",
        F.expr(
            "CAST((n_rows * bits_per_value + 7) div 8"
            " + dict_page_bytes AS BIGINT)"
        ).alias("dict_bytes"),
        F.expr(
            "CAST(CASE WHEN (n_rows * bits_per_value + 7) div 8"
            " + dict_page_bytes < plain_bytes THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("use_dict"),
    )


def _quartile_thresholds(metric: DataFrame, col: str) -> DataFrame:
    """1-row (t1, t2, t3) exact quartile boundaries of ``col``:
    t_k = min value whose cumulative user count reaches k·n/4
    (4·cum ≥ k·n keeps the comparison integer). Computed over the
    DISTINCT-value histogram, so the global cumulative window runs
    over value cardinality, not user cardinality — the scale contract
    (recency is bounded by the time range, frequency by activity;
    monetary pre-buckets to whole units in the caller for the same
    reason). Ties all land on the same side of a boundary — no
    per-user tiebreak, no global row sort."""
    counts = metric.groupBy(col).agg(F.count("*").alias("c"))
    cum = counts.select(
        F.col(col).alias("v"),
        F.sum("c").over(Window.orderBy(col)).alias("cum"),
        F.sum("c").over(
            Window.partitionBy()
        ).alias("n"),
    )
    return cum.agg(
        *[
            F.min(
                F.when(4 * F.col("cum") >= k * F.col("n"), F.col("v"))
            ).alias(f"t{k}")
            for k in (1, 2, 3)
        ]
    )


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic user-value cube (recency ×
    frequency × monetary quartiles) a curation/marketing pipeline
    cuts its audience with: each user lands in one of 4³ cells, the
    report is the cell census. Quartile boundaries are EXACT
    cumulative-histogram ranks (no ntile: its tie handling is
    position-dependent and engine-divergent; here equal metric values
    always share a segment), monetary uses exact integer cents
    (whole units for thresholding, bounding the distinct-value
    histogram), and segments are 1..4 ascending in metric value —
    hash-exact across engines.

    Scale: one user-keyed partial agg over events, three tiny
    distinct-value histograms with bounded cardinality, and 9 scalar
    thresholds broadcast back — the corpus never globally sorts.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("long").alias("epoch"),
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    um = ev.groupBy("user_id").agg(
        F.max("epoch").alias("last_epoch"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("purchase_cents"),
    )
    gmax = ev.agg(F.max("epoch").alias("gmax"))
    # cached: the three quartile histograms AND the final cube all
    # read this user-cardinality frame — without the barrier each
    # branch would re-scan events (4 fact scans instead of 1)
    m = (
        um.crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            (F.col("gmax") - F.col("last_epoch")).alias("recency_s"),
            "n_events",
            "purchase_cents",
            F.expr("purchase_cents div 100").alias("mon_units"),
        )
        .cache()
    )
    rt = _quartile_thresholds(m, "recency_s")
    ft = _quartile_thresholds(m, "n_events")
    mt = _quartile_thresholds(m, "mon_units")

    def seg(col: str, t: str) -> F.Column:
        return (
            F.lit(1)
            + F.when(F.col(col) > F.col(f"{t}.t1"), 1).otherwise(0)
            + F.when(F.col(col) > F.col(f"{t}.t2"), 1).otherwise(0)
            + F.when(F.col(col) > F.col(f"{t}.t3"), 1).otherwise(0)
        ).cast("int")

    enriched = (
        m.crossJoin(F.broadcast(rt.select(F.struct("*").alias("rt"))))
        .crossJoin(F.broadcast(ft.select(F.struct("*").alias("ft"))))
        .crossJoin(F.broadcast(mt.select(F.struct("*").alias("mt"))))
        .select(
            seg("recency_s", "rt").alias("r_seg"),
            seg("n_events", "ft").alias("f_seg"),
            seg("mon_units", "mt").alias("m_seg"),
            "n_events",
            "purchase_cents",
        )
    )
    return enriched.groupBy("r_seg", "f_seg", "m_seg").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("sum_events"),
        F.sum("purchase_cents").cast("long").alias("sum_purchase_cents"),
    )


def value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event type —
    early-vs-late era (the same exact integer epoch midpoint as
    value_drift_eras), the distribution-free companion to that
    operator's banded chi-square view: D = max_x |F_early(x) −
    F_late(x)| over the pooled support.

    Exact-integer core: the statistic is computed as the integer
    numerator max |cum_early·n_late − cum_late·n_early| (no doubles
    until ONE final division), so both engines land bit-identical
    results; ``at_value`` is the smallest value attaining the max
    (deterministic under ties).

    Scale: one (type, value) map-combinable count, one window cumsum
    per event_type (sort-based CDF — the canonical distributed KS
    shape), then a per-type max. Nothing is corpus-quadratic; the
    window key is event_type, whose cardinality is tiny, but each
    partition is only |distinct values| rows AFTER the count combine,
    not raw events.

    Overflow discipline (VERDICT r8 #3, the trend_from_moments
    pattern): the products cum·n cross int64 once n_early·n_late
    exceeds 2⁶³ (~3e9 events per era side of one type), so every
    product runs in DECIMAL(38,0) — exact for any int64 era counts
    (products ≤ ~8.5e37 < 10³⁸); the DuckDB twin is already int128
    (SUM(BIGINT) → HUGEINT). Only the final ks_num casts back to
    BIGINT, which holds while the STATISTIC itself fits int64
    (D·n_early·n_late < 2⁶³ — the value's own representability, not
    an arithmetic artifact); past that DuckDB raises loudly but
    non-ANSI Spark degrades the column to NULL SILENTLY (ADVICE r9)
    — the failure then surfaces only as an oracle hash mismatch, and
    d_stat (double) remains the consumable.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("long").alias("epoch"),
        "value",
    )
    _, mid, _ = epoch_span_midpoint(ev, F.col("epoch"))
    per_val = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("epoch") < mid, 1).otherwise(0))
        .cast("long")
        .alias("n_e"),
        F.sum(F.when(F.col("epoch") >= mid, 1).otherwise(0))
        .cast("long")
        .alias("n_l"),
    )
    return ks_from_value_counts(per_val)


def ks_from_value_counts(per_val: DataFrame) -> DataFrame:
    """KS completion over per-(event_type, value) era counts
    (n_e, n_l) — split out so the overflow-regime property test can
    feed planted counts past the int64 product bound directly."""
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    scored = per_val.select(
        "event_type",
        "value",
        F.sum("n_e").over(wt).alias("n_early"),
        F.sum("n_l").over(wt).alias("n_late"),
        F.abs(
            d(F.sum("n_e").over(w)) * d(F.sum("n_l").over(wt))
            - d(F.sum("n_l").over(w)) * d(F.sum("n_e").over(wt))
        ).alias("ks_num"),
    )
    top = scored.groupBy("event_type", "n_early", "n_late").agg(
        F.max("ks_num").alias("ks_num")
    )
    return (
        scored.join(top, ["event_type", "n_early", "n_late", "ks_num"])
        .groupBy("event_type", "n_early", "n_late", "ks_num")
        .agg(F.min("value").alias("at_value"))
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.col("ks_num").cast("long").alias("ks_num"),
            (
                F.col("ks_num").cast("double")
                / (d(F.col("n_early")) * d(F.col("n_late"))).cast(
                    "double"
                )
            ).alias("d_stat"),
            "at_value",
        )
    )


#: Benford leading-digit expectation log10(1 + 1/d), d = 1..9, as
#: FIXED decimal literals shared verbatim with the oracle SQL — the
#: same decimal text parses to the same double in both engines,
#: avoiding any libm log() call in the graded path.
BENFORD_P = [
    "0.301029995663981",
    "0.176091259055681",
    "0.124938736608300",
    "0.096910013008056",
    "0.079181246047625",
    "0.066946789630613",
    "0.057991946977687",
    "0.051152522447381",
    "0.045757490560675",
]


def benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the extended-price column — the classic
    fabricated-numbers screen a data-quality pass runs over numeric
    feeds. Emits per leading digit: observed count, expected count
    n·p_d (p_d as shared decimal literals, no libm), and the
    chi-square contribution (obs − exp)²/exp.

    Scale: a 9-row map-combinable aggregate — scan speed at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem").select(
        F.substring(
            F.regexp_replace(
                F.col("l_extendedprice").cast("string"), r"[^1-9]", ""
            ),
            1,
            1,
        ).alias("digit")
    )
    counts = li.where(F.col("digit") != "").groupBy("digit").agg(
        F.count("*").cast("long").alias("observed")
    )
    total = counts.agg(F.sum("observed").alias("n_total"))
    expect = local_frame(spark, 
        [(str(d + 1), p) for d, p in enumerate(BENFORD_P)],
        "digit string, p string",
    ).select("digit", F.col("p").cast("double").alias("p"))
    joined = expect.join(F.broadcast(total)).join(counts, "digit", "left")
    obs = F.coalesce(F.col("observed"), F.lit(0)).cast("long")
    exp_ = F.col("n_total") * F.col("p")
    return joined.select(
        "digit",
        obs.alias("observed"),
        F.round(exp_, 4).alias("expected"),
        F.round((obs - exp_) * (obs - exp_) / exp_, 4).alias("chi2_term"),
    )


def mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum drift test per event type — the third
    member of the era-drift family (banded chi-square →
    value_drift_eras, distribution-free max-gap → value_ks_drift,
    rank-based location shift → this): U detects a median shift KS
    can under-weight and the histogram bands can smear.

    Exact-integer core with TIES: using per-(type, value) counts, the
    doubled midrank of a distinct value is 2·c_prev + e + l + 1, so
    the doubled rank-sum R1×2 = Σ e·(2·c_prev + e + l + 1) is exact
    integer arithmetic; u2_stat = 2·U1 = R1×2 − n1(n1+1) (ties
    contribute halves to U, whole numbers to 2U). The one double is
    auc = U1/(n1·n2) — the common-language effect size
    P(early > late) + ½P(tie) — a single exact-integer division.

    Scale: identical shape to value_ks_drift — one map-combinable
    (type, value) count, one per-type sort-based cumsum, a per-type
    fold. The window partition holds |distinct values| rows, never
    raw events.

    Overflow discipline (VERDICT r8 #3, the trend_from_moments
    pattern): r1x2 grows ~(n_early+n_late)² per event_type and
    crosses int64 at ~3e9 events per type, so the midrank product
    and its sum run in DECIMAL(38,0) — exact for any int64 era
    counts (r1x2 ≤ ~8.5e37 < 10³⁸); the DuckDB twin is already
    int128 (SUM(BIGINT) → HUGEINT). Only u2_stat casts back to
    BIGINT, which holds while the statistic itself fits int64
    (2·U₁ ≤ 2·n_early·n_late < 2⁶³ — the value's representability,
    not an arithmetic artifact: an unbalanced split overflows r1x2
    long before u2); past that DuckDB raises loudly but non-ANSI
    Spark degrades the column to NULL SILENTLY (ADVICE r9) — the
    failure then surfaces only as an oracle hash mismatch, and auc
    (double) remains the consumable.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("long").alias("epoch"),
        "value",
    )
    _, mid, _ = epoch_span_midpoint(ev, F.col("epoch"))
    per_val = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("epoch") < mid, 1).otherwise(0))
        .cast("long")
        .alias("e"),
        F.sum(F.when(F.col("epoch") >= mid, 1).otherwise(0))
        .cast("long")
        .alias("l"),
    )
    return mw_from_value_counts(per_val)


def mw_from_value_counts(per_val: DataFrame) -> DataFrame:
    """Mann-Whitney completion over per-(event_type, value) era
    counts (e, l) — split out so the overflow-regime property test
    can feed planted counts past the int64 r1x2 bound directly."""
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c_prev = F.coalesce(F.sum(F.col("e") + F.col("l")).over(w), F.lit(0))
    contrib = d(F.col("e")) * (
        d(c_prev) * 2 + d(F.col("e")) + d(F.col("l")) + 1
    )
    folded = per_val.select(
        "event_type", "e", "l", contrib.alias("r1x2")
    ).groupBy("event_type").agg(
        F.sum("e").alias("n_early"),
        F.sum("l").alias("n_late"),
        F.sum("r1x2").alias("r1x2"),
    )
    u2 = F.col("r1x2") - d(F.col("n_early")) * (d(F.col("n_early")) + 1)
    return folded.select(
        "event_type",
        "n_early",
        "n_late",
        u2.cast("long").alias("u2_stat"),
        (
            u2.cast("double")
            / (
                d(F.col("n_early")) * d(F.col("n_late")) * 2
            ).cast("double")
        ).alias("auc"),
    )
