"""Cluster-analysis operator semantics on crafted inputs."""

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.functions.parsing import with_issue_flags
from cassandra_log_analyzer_mcp_spark.operators import analysis


def _logs_df(spark, rows):
    """rows: (node, level, message, ts, line_id)."""
    base = spark.createDataFrame(
        [
            Row(
                line_id=lid,
                node=node,
                raw=f"{level} [x] [t] C:1 - {message}",
                level=level,
                ts_str="",
                thread="t",
                clazz="C",
                line_no=1,
                message=message,
                ts=ts,
            )
            for (node, level, message, ts, lid) in rows
        ]
    )
    return with_issue_flags(base)


TS = datetime(2025, 1, 1, 12, 0, 0)


def ts(minute, second=0):
    return datetime(2025, 1, 1, 12, minute, second)


def test_recommendations_thresholds(spark):
    # 11 timeouts (> 10 fires), 1 oom (> 0 fires), 5 gc (NOT > 5)
    rows = (
        [("n0", "ERROR", "request timed out", TS, i) for i in range(11)]
        + [("n0", "ERROR", "java.lang.OutOfMemoryError", TS, 100)]
        + [("n0", "WARN", "GC pause of 100ms", TS, 200 + i) for i in range(5)]
    )
    got = {r.issue: r for r in analysis.recommendations(_logs_df(spark, rows)).collect()}
    assert set(got) == {"timeout", "oom"}
    assert got["oom"].severity == "CRITICAL"
    assert got["timeout"].n == 11


def test_get_errors_per_node_limit(spark):
    rows = [("n0", "ERROR", f"boom {i}", ts(0, i), i) for i in range(60)] + [
        ("n1", "ERROR", "solo", TS, 1000)
    ]
    got = analysis.get_errors(_logs_df(spark, rows), limit_per_node=50)
    counts = {r.node: r.cnt for r in got.groupBy("node").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"n0": 50, "n1": 1}


def test_error_bursts_gap_semantics(spark):
    # Three errors within 5 min = one burst; a 10-min gap starts a new one.
    rows = [
        ("n0", "ERROR", "e1", ts(0), 1),
        ("n0", "ERROR", "e2", ts(2), 2),
        ("n0", "ERROR", "e3", ts(4), 3),
        ("n0", "ERROR", "e4", ts(14), 4),
    ]
    got = sorted(
        analysis.error_bursts(_logs_df(spark, rows)).collect(),
        key=lambda r: r.burst_id,
    )
    assert [r.n_events for r in got] == [3, 1]
    assert got[0].duration_s == 240


def test_burst_context_contains_its_own_errors(spark):
    # burst of 3 errors [t0, t0+4m] plus an INFO inside and one far
    # outside the interval
    rows = [
        ("n0", "ERROR", "e1", ts(0), 1),
        ("n0", "ERROR", "e2", ts(2), 2),
        ("n0", "INFO", "context line", ts(3), 3),
        ("n0", "ERROR", "e3", ts(4), 4),
        ("n0", "INFO", "far away", ts(40), 5),
    ]
    got = analysis.burst_context(_logs_df(spark, rows)).collect()
    # one burst row; contains the 3 errors + 1 in-range INFO line
    by_burst = {(r.node, r.burst_id): r for r in got}
    assert len(by_burst) == 1
    r = got[0]
    assert r.n_lines == 4
    assert r.n_info == 1
    assert r.n_warn == 0


def test_burst_context_range_join_is_not_nested_loop(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged

    df = analysis.burst_context(logs_flagged(spark, sf_dir))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the whole point of the bucketed formulation: an equi-join on
    # (node, bucket), never a nested-loop over lines × bursts
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_node_summary_counts_levels_and_issues(spark):
    rows = [
        ("n0", "INFO", "Dropped 2 HINT messages during drain", TS, 1),  # issue-error
        ("n0", "INFO", "all fine", TS, 2),
        ("n0", "WARN", "whatever", TS, 3),
    ]
    got = analysis.node_summary(_logs_df(spark, rows)).collect()[0]
    assert (got.errors, got.warnings, got.total_lines) == (1, 1, 3)


def test_search_logs_numbers_all_lines_before_filtering(spark):
    rows = [
        ("n0", "INFO", "nothing", TS, 10),
        ("n0", "ERROR", "needle here", TS, 20),
        ("n0", "INFO", "needle again", TS, 30),
    ]
    got = analysis.search_logs(_logs_df(spark, rows), "needle").collect()
    assert [r.line_number for r in got] == [2, 3]


def test_node_metrics_correlation_joins_only_shared_windows(spark):
    logs = _logs_df(
        spark,
        [
            ("node1", "ERROR", "boom", TS, 1),
            ("node1", "ERROR", "boom again", ts(30), 2),
            ("node1", "INFO", "fine", ts(45), 3),
        ],
    )
    # user_id 1 → node1 (matches logs); user_id 2 → node2 (no logs → dropped)
    events = spark.createDataFrame(
        [Row(user_id=1, ts=ts(m), value=float(v)) for m, v in
         [(0, 1.0), (5, 2.0), (10, 3.0), (15, 4.0), (20, 5.0)]]
        + [Row(user_id=2, ts=TS, value=9.0)]
    )
    got = analysis.node_metrics_correlation(logs, events).collect()
    assert len(got) == 1
    r = got[0]
    assert r.node == "node1" and r.n_ops == 5 and r.n_errors == 2
    assert r.p50_value == 3.0
    assert r.p95_value == 4.8  # 0.95*(5-1)=3.8 → 4.0 + 0.8*(5.0-4.0)


def test_error_sessions_keeps_exact_gap_event(spark):
    rows = [
        ("n0", "ERROR", "a", ts(0), 1),
        ("n0", "ERROR", "b", ts(5), 2),      # exactly 300s → MERGES (touching)
        ("n0", "ERROR", "c", ts(10, 1), 3),  # 301s later → new session
    ]
    got = sorted(
        (r.start_s, r.end_s_excl, r.n_events)
        for r in analysis.error_sessions(_logs_df(spark, rows)).collect()
    )
    base = int(ts(0).replace(tzinfo=__import__("datetime").timezone.utc).timestamp())
    assert got == [
        (base, base + 300 + 300, 2),
        (base + 601, base + 601 + 300, 1),
    ]


def test_dropped_messages_extracts_counts(spark):
    rows = [
        ("n0", "ERROR", "Dropped 17 READ messages in the last interval", TS, 1),
        ("n0", "INFO", "Dropped 2 HINT messages during drain", TS, 2),
        ("n0", "ERROR", "Dropped 17 READ messages in the last interval", TS, 3),
        ("n0", "INFO", "nothing dropped here", TS, 4),
    ]
    got = {
        (r.node, r.msg_type): (r.n_lines, r.total_dropped)
        for r in analysis.dropped_messages(_logs_df(spark, rows)).collect()
    }
    assert got == {("n0", "READ"): (2, 34), ("n0", "HINT"): (1, 2)}


def test_event_funnel_orders_stages(spark):
    def ev(uid, typ, minute):
        return Row(user_id=uid, event_type=typ, ts=ts(minute))

    events = spark.createDataFrame([
        # user 1 completes the funnel in order
        ev(1, "view", 0), ev(1, "click", 1), ev(1, "purchase", 2),
        # user 2 clicked only BEFORE the first view → stalls at view
        ev(2, "click", 0), ev(2, "view", 1),
        # user 3: view then click, never purchases
        ev(3, "view", 0), ev(3, "click", 5),
        # user 4: purchase without view/click → counts nowhere
        ev(4, "purchase", 0),
    ])
    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    orig = an.table
    try:
        an.table = lambda spark_, sf_dir_, name_: events
        got = {r.stage: r.n_users for r in an.event_funnel(spark, "x").collect()}
    finally:
        an.table = orig
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_error_anomaly_hours_flags_spike(spark):
    from datetime import timedelta

    rows = []
    lid = 0
    # node n0: 1 error in each of 3 hours, then a 10-error spike hour
    for h, n in [(0, 1), (1, 1), (2, 1), (3, 10)]:
        for i in range(n):
            rows.append(("n0", "ERROR", "x", TS + timedelta(hours=h), lid))
            lid += 1
    got = analysis.error_anomaly_hours(_logs_df(spark, rows)).collect()
    assert len(got) == 1
    assert got[0].errors == 10 and got[0].median_errors == 1.0


def test_retention_cohorts_offsets(spark):
    from datetime import datetime, timedelta

    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    base = datetime(2025, 1, 6)  # within one epoch-week bucket

    def ev(uid, weeks):
        return Row(user_id=uid, ts=base + timedelta(weeks=weeks))

    events = spark.createDataFrame([
        ev(1, 0), ev(1, 2),   # cohort w0, returns at offset 2
        ev(2, 0),             # cohort w0, never returns
        ev(3, 1), ev(3, 1),   # cohort w1, two events same week
    ])
    orig = an.table
    try:
        an.table = lambda s, d, n: events
        got = {
            (r.week_offset, r.n_users): r.cohort_week
            for r in an.retention_cohorts(spark, "x").collect()
        }
    finally:
        an.table = orig
    offsets = sorted(k for k in got)
    assert offsets == [(0, 1), (0, 2), (2, 1)]
    # the two offset-0 rows belong to different cohort weeks
    assert got[(0, 2)] < got[(0, 1)]


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators import analytics

    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    rows = analytics.event_value_percentiles_approx(
        spark, sf_dir
    ).collect()
    # 5 event types x 3 quantiles, long form with the in-query flag
    assert len(rows) == 15
    # GK's guarantee is RANK-based (value-space gaps blow up in heavy
    # tails): the empirical CDF position of each sketch output must sit
    # within eps of its target quantile — re-derived here INDEPENDENTLY
    # of the query's own n_lt/n_le rank columns, which must agree.
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    for r in rows:
        assert r.within_bound, (r.event_type, r.q)
        below = ev.filter(
            (F.col("event_type") == r.event_type)
            & (F.col("value") <= r.approx_value)
        ).count()
        assert below == r.n_le, (r.event_type, r.q)
        eps = max(2.0 / r.n, 0.01)
        assert abs(below / r.n - r.q) <= eps, (r.event_type, r.q)


def test_table_profile_approx_matches_exact_within_bound(spark, sf_dir):
    """The approx profile is the exact profile with ONLY the ndv
    column sketched: nulls/min/max/n_rows are identical, and every
    approx ndv sits within 4·rsd of the exact distinct count (HLL++'s
    standard-deviation contract, 4 sigma)."""
    from cassandra_log_analyzer_mcp_spark.operators import analytics

    exact = {r.column: r for r in analytics.table_profile(
        spark, sf_dir).collect()}
    approx = {r.column: r for r in analytics.table_profile_approx(
        spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls, a.min_value, a.max_value) == (
            e.n_rows, e.n_nulls, e.min_value, e.max_value)
        # the in-query exact column must equal the graded twin's, and
        # the in-band flag must agree with the 4-sigma contract
        assert a.n_distinct_exact == e.n_distinct, c
        tol = 4 * analytics.PROFILE_APPROX_RSD * e.n_distinct
        assert abs(a.n_distinct_approx - e.n_distinct) <= max(tol, 1), (
            c, a.n_distinct_approx, e.n_distinct)
        assert a.within_bound, c


def test_distinct_users_sketch_error_bound(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators import analytics
    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    approx = {
        r.event_type: r.approx_users
        for r in analytics.distinct_users_sketch(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.05 * n)


def test_node_failure_correlation_bounds(spark, sf_dir):
    """Pearson r stays in [-1, 1] and every unordered node pair
    appears exactly once."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        node_failure_correlation,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged

    rows = node_failure_correlation(logs_flagged(spark, sf_dir)).collect()
    assert rows
    nodes = {r.na for r in rows} | {r.nb for r in rows}
    assert len(rows) == len(nodes) * (len(nodes) - 1) // 2
    for r in rows:
        assert r.na < r.nb
        assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9


def test_error_recovery_gap_between_bursts(spark):
    # two bursts 10 min apart: burst1 ends 12:01, burst2 starts 12:11
    rows = [
        ("n0", "ERROR", "boom", ts(0), 0),
        ("n0", "ERROR", "boom", ts(1), 1),
        ("n0", "ERROR", "boom", ts(11), 2),
    ]
    got = analysis.error_recovery(_logs_df(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_bursts == 2 and r.n_gaps == 1
    assert r.mean_gap_s == 600.0 and r.max_gap_s == 600


def test_thread_hotspots_share(spark):
    base = _logs_df(
        spark,
        [
            ("n0", "ERROR", "boom", TS, 0),
            ("n0", "ERROR", "boom", TS, 1),
            ("n0", "INFO", "fine", TS, 2),
        ],
    )
    # two threads: t carries all errors
    mixed = base.withColumn(
        "thread", F.when(F.col("line_id") < 2, "a").otherwise("b")
    )
    got = {r.thread: r for r in analysis.thread_hotspots(mixed).collect()}
    assert got["a"].error_share == 1.0 and got["b"].error_share == 0.0
    assert got["a"].node_errors == 2


def test_search_context_attaches_neighbors(spark):
    rows = [
        ("n0", "INFO", "before", ts(0), 0),
        ("n0", "WARN", "tombstone warning threshold", ts(1), 1),
        ("n0", "INFO", "after", ts(2), 2),
    ]
    got = analysis.search_context(_logs_df(spark, rows), "tombstone").collect()
    assert len(got) == 1
    assert "before" in got[0].prev_line and "after" in got[0].next_line
    assert got[0].line_number == 2


def test_template_drift_shares(spark):
    # "a <NUM>" only early, "b" only late → drift -tot vs +tot
    rows = [
        ("n0", "INFO", "a 1", ts(0), 0),
        ("n0", "INFO", "a 2", ts(1), 1),
        ("n0", "INFO", "b", ts(50), 2),
        ("n0", "INFO", "b", ts(59), 3),
    ]
    got = {r.template: r for r in analysis.template_drift(_logs_df(spark, rows)).collect()}
    assert got["a <NUM>"].early_share == 1.0 and got["a <NUM>"].late_share == 0.0
    assert got["b"].drift == 1.0


def test_alert_dedup_cooldown(spark):
    # 11 timeouts per 15-min window in windows at t=0, +900s, +2h:
    # windows 1 and 2 are 900s apart (suppressed), window 3 is
    # 6300s > cooldown after window 2 (fires again)
    base = datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    lid = 0
    for off_s in (0, 900, 2 * 3600):
        for i in range(11):
            rows.append(
                ("n0", "ERROR", "request timed out",
                 datetime.fromtimestamp(base.timestamp() + off_s + i),
                 lid)
            )
            lid += 1
    fired = analysis.windowed_alerts(_logs_df(spark, rows))
    kept = analysis.alert_dedup(_logs_df(spark, rows))
    assert fired.count() == 3
    got = sorted(r.win_start for r in kept.collect())
    assert len(got) == 2
    assert got[1] - got[0] == 2 * 3600


def test_tdigest_percentiles_close_to_exact(spark, sf_dir):
    """The mergeable t-digest's outputs must sit within rank-eps of
    their target quantiles (same rank-based criterion as the GK
    test), and its n must be the exact count (weights are counts)."""
    from cassandra_log_analyzer_mcp_spark.operators import analytics
    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    td = {
        r.event_type: {"0.5": r.p50, "0.95": r.p95, "0.99": r.p99, "n": r.n}
        for r in analytics.event_value_percentiles_tdigest(
            spark, sf_dir
        ).collect()
    }
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    exact_n = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {t: v["n"] for t, v in td.items()} == exact_n
    for t, vals in td.items():
        n = vals["n"]
        for target in ("0.5", "0.95", "0.99"):
            below = ev.filter(
                (F.col("event_type") == t) & (F.col("value") <= vals[target])
            ).count()
            eps = max(2.0 / n, 0.01)
            assert abs(below / n - float(target)) <= eps, (t, target)


def test_interval_bin_join_equals_brute_force(spark):
    """Property: the bin-and-residual range join produces EXACTLY the
    brute-force pair set on adversarial intervals (boundary-touching,
    bin-straddling, duplicates)."""
    import pandas as pd

    from pyspark.sql import functions as F

    # points at bin edges, interval ends exactly on points, overlaps
    W = 10  # bin width = window
    hv = [(1, 100), (2, 109), (3, 120), (4, 95)]      # (id, ts)
    err = [(10, 90), (11, 100), (12, 110), (13, 119), (14, 130), (15, 131)]
    hv_df = spark.createDataFrame(
        [(i, t - W, t + W) for i, t in hv], "hid long, lo long, hi long"
    )
    err_df = spark.createDataFrame(err, "eid long, ets long")
    binned_hv = hv_df.select(
        "*",
        F.explode(
            F.sequence(F.expr(f"lo div {W}"), F.expr(f"hi div {W}"))
        ).alias("bin"),
    )
    binned_err = err_df.withColumn("bin", F.expr(f"ets div {W}"))
    got = {
        (r.hid, r.eid)
        for r in binned_hv.join(binned_err, "bin")
        .filter((F.col("ets") >= F.col("lo")) & (F.col("ets") <= F.col("hi")))
        .select("hid", "eid")
        .collect()
    }
    want = {
        (i, j)
        for i, t in hv
        for j, u in err
        if t - W <= u <= t + W
    }
    assert got == want


def test_bloom_prune_reduces_probe_rows(spark, sf_dir):
    """The 3-position Bloom prune must pass every true-match row and
    strictly fewer rows than the unpruned fact (the runtime-filter
    payoff the plan exists for)."""
    from pyspark.sql import functions as F

    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        _bloom_join_positions,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    pruned = li
    for j, pos in enumerate(_bloom_join_positions(F.col("l_orderkey"))):
        bits = urgent.select(
            _bloom_join_positions(F.col("o_orderkey"))[j].alias("p")
        ).distinct()
        pruned = pruned.join(F.broadcast(bits), pos == F.col("p"), "left_semi")
    n_fact = li.count()
    n_pruned = pruned.count()
    n_true = li.join(
        urgent.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    ).count()
    assert n_true <= n_pruned < n_fact


def test_cusum_fires_only_after_sustained_shift(spark):
    """Synthetic regime shift: 10 quiet hours (1 err/h) then 5 noisy
    hours (10 err/h). k = ceil(60/15) = 4, so the quiet region's
    prefix sums only fall (S=0, no alarm) and the noisy region climbs
    by 6/hour — alarms exactly when S ∈ {18, 24, 30} > 3k = 12, i.e.
    the shift's last three hours. Derived by hand from the CUSUM
    definition, so this pins the closed-form rewrite, the zero-fill,
    and the integer k in one pass."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        error_cusum_changepoints,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000 - (1_600_000_000 % 3600)
    rows = []
    for hr in range(15):
        n = 1 if hr < 10 else 10
        rows += [(base + hr * 3600 + i, "n1", True) for i in range(n)]
    logs = (
        spark.createDataFrame(rows, "epoch long, node string, is_error boolean")
        .select(
            F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error"
        )
    )
    out = error_cusum_changepoints(logs).orderBy("hour_s").collect()
    assert [r.cusum for r in out] == [18, 24, 30]
    assert [r.hour_s for r in out] == [base + h * 3600 for h in (12, 13, 14)]
    assert all(r.k_ref == 4 for r in out)


def test_coverage_gaps_finds_engineered_silence(spark):
    """Synthetic node with hours 0-2 active, 3-6 silent, 7 active,
    9 active (8 silent): expected 10 grid hours, 5 silent, longest
    streak 4 — pins the zero-fill and the gaps-and-islands streak."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        node_coverage_gaps,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000 - (1_600_000_000 % 3600)
    active = [0, 1, 2, 7, 9]
    rows = [(base + h * 3600, "nX", False) for h in active]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error")
    r = node_coverage_gaps(logs).collect()[0]
    assert (
        r.expected_hours,
        r.observed_hours,
        r.silent_hours,
        r.longest_gap_hours,
    ) == (10, 5, 5, 4)


def test_error_ewma_matches_python_refold(spark, sf_dir):
    """The F.aggregate integer fold is re-run in plain Python over the
    same zero-filled series — state transitions must agree exactly
    (the property the recursive-CTE oracle also grades)."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        EWMA_MIN_X,
        EWMA_SCALE,
        cusum_series,
        error_ewma_smoothed,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged

    logs = logs_flagged(spark, sf_dir)
    series = {}
    for r in cusum_series(logs).collect():
        series.setdefault(r.node, []).append((r.h, r.x))
    expect = {}
    for node, hx in series.items():
        ewma, n_spikes = -1, 0
        xs = [x for _, x in sorted(hx)]
        for x in xs:
            scaled = x * EWMA_SCALE
            if ewma < 0:
                ewma = scaled
            else:
                if 2 * scaled > 3 * ewma and x >= EWMA_MIN_X:
                    n_spikes += 1
                ewma = (scaled + 3 * ewma) // 4
        expect[node] = (len(xs), max(xs), ewma, n_spikes)
    got = {
        r.node: (r.n_hours, r.max_errors, r.ewma_final, r.n_spikes)
        for r in error_ewma_smoothed(logs).collect()
    }
    assert got == expect


def test_purchase_gap_hazard_km_invariants(spark, sf_dir):
    """KM risk-table identities: at_risk(0) = total subjects
    (purchases), at_risk strictly decreases in day_offset (tail
    sums), and censored subjects = users with >=1 purchase (each
    user's final purchase is exactly the one censored row)."""
    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        purchase_gap_hazard,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    rows = sorted(
        purchase_gap_hazard(spark, sf_dir).collect(),
        key=lambda r: r.day_offset,
    )
    p = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    n_purch = p.count()
    n_buyers = p.select("user_id").distinct().count()
    assert rows[0].day_offset >= 0
    at = [r.at_risk for r in rows]
    assert all(a > b for a, b in zip(at, at[1:]))
    assert at[0] == n_purch  # at_risk at the smallest offset = subjects
    n_events = sum(r.n_repurchases for r in rows)
    assert n_purch - n_events == n_buyers


def test_last_touch_attribution_crafted(spark):
    """view→purchase inside the window credits 'view'; a stale touch
    (older than the window) and a no-touch purchase both credit
    'direct'; a later touch overrides an earlier one."""
    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    def ev(eid, uid, typ, minute, value=10.0):
        return Row(
            event_id=eid, user_id=uid, event_type=typ,
            ts=ts(minute), value=value, props="{}",
        )

    events = spark.createDataFrame([
        # u1: view @0, click @1, purchase @2 -> last touch is click
        ev(1, 1, "view", 0), ev(2, 1, "click", 1),
        ev(3, 1, "purchase", 2, 40.0),
        # u2: purchase with no touch at all -> direct
        ev(4, 2, "purchase", 0, 10.0),
        # u3: view @0, purchase 3 h later -> stale -> direct
        ev(5, 3, "view", 0), ev(6, 3, "purchase", 59, 10.0),
    ])
    # 3h staleness needs minutes beyond ts()'s hour: shift u3's
    # purchase epoch directly instead
    events = events.withColumn(
        "ts",
        F.when(F.col("event_id") == 6, F.col("ts") + F.expr(
            "INTERVAL 150 MINUTES")).otherwise(F.col("ts")),
    )
    orig = an.table
    try:
        an.table = lambda s, d, n: events
        rows = {r.channel: r for r in
                an.last_touch_attribution(spark, "x").collect()}
    finally:
        an.table = orig
    assert rows["click"].n_purchases == 1
    assert rows["click"].revenue_cents == 4000
    assert rows["direct"].n_purchases == 2
    assert rows["direct"].revenue_cents == 2000
    assert set(rows) == {"click", "direct"}
    assert rows["click"].revenue_share_pm == 666


def test_weighted_quartiles_match_numpy_refold(spark, sf_dir):
    """The cumsum-threshold quantile is re-derived in plain Python
    from the raw (cents, weight) pairs — weighted lower-quantile
    semantics must agree exactly, and quartiles must be ordered."""
    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        weighted_price_quartiles,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    li = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .collect()
    )
    acc = {}
    for r in li:
        acc.setdefault(r.l_returnflag, []).append((r.c, r.w))
    expect = {}
    for flag, cw in acc.items():
        cw.sort()
        total = sum(w for _, w in cw)
        qs = []
        for k in (1, 2, 3):
            cum = 0
            for c, w in cw:
                cum += w
                if 4 * cum >= k * total:
                    qs.append(c)
                    break
        expect[flag] = (total, *qs)
    got = {
        r.l_returnflag: (r.total_weight, r.q1_cents, r.median_cents,
                         r.q3_cents)
        for r in weighted_price_quartiles(spark, sf_dir).collect()
    }
    assert got == expect
    for total, q1, q2, q3 in got.values():
        assert q1 <= q2 <= q3


def test_kmv_set_ops_identities_and_regimes(spark, sf_dir):
    """Inclusion-exclusion holds on the truths; any set smaller than
    K sits in the sketch's EXACT regime (its estimate IS the truth);
    estimator outputs are nonnegative and intersection never exceeds
    the union estimate."""
    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        KMV_K,
        kmv_set_ops,
    )

    r = kmv_set_ops(spark, sf_dir).collect()[0]
    assert r.true_union == r.true_a + r.true_b - r.true_inter
    for t, e in ((r.true_a, r.est_a), (r.true_b, r.est_b),
                 (r.true_union, r.est_union)):
        if t < KMV_K:
            assert e == t  # exact regime
        else:
            assert 0 < e
    assert 0 <= r.est_inter <= r.est_union


def test_funnel_time_bounded_tighter_than_unbounded(spark, sf_dir):
    """Deadlines only REMOVE conversions: each bounded stage count is
    <= the unbounded funnel's corresponding stage, and the funnel is
    monotone within itself."""
    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        event_funnel,
        funnel_time_bounded,
    )

    bounded = {r.stage: r.n_users for r in
               funnel_time_bounded(spark, sf_dir).collect()}
    unbounded = {r.stage: r.n_users for r in
                 event_funnel(spark, sf_dir).collect()}
    assert bounded["1_view"] == unbounded["view"]
    assert bounded["2_click_1h"] <= unbounded["click"]
    assert bounded["3_purchase_4h"] <= unbounded["purchase"]
    assert (bounded["1_view"] >= bounded["2_click_1h"]
            >= bounded["3_purchase_4h"] >= 0)


def test_trending_decay_prefers_recent_spike(spark):
    """10 occurrences today must outrank 100 occurrences 10 days ago
    (decayed to 100 >> 10 = 0): the recency property plain counts
    invert."""
    import datetime as dt

    old = dt.datetime(2025, 1, 1, 12, 0, 0)
    new = old + dt.timedelta(days=10)
    rows = (
        [("n0", "ERROR", "chronic noise", old, i) for i in range(100)]
        + [("n0", "ERROR", "fresh spike", new, 1000 + i) for i in range(10)]
    )
    got = {r.template: r for r in
           analysis.template_trending_decayed(_logs_df(spark, rows)).collect()}
    assert got["fresh spike"].decayed_score == 10
    assert got["chronic noise"].decayed_score == 0
    assert got["fresh spike"].rk < got["chronic noise"].rk
    assert got["chronic noise"].raw_count == 100


def test_seasonal_mad_ignores_recurring_noise_flags_one_spike(spark):
    """A slot that is noisy EVERY day (hod=2: 10 errors/day) has
    dev=0 against its own seasonal median and never flags; a one-day
    spike in an otherwise-quiet slot (hod=5, day 2: 9 errors) is the
    only flagged hour. A global per-node median would flag all four
    noisy-hod hours — the seasonal baseline is what suppresses them."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        error_seasonal_mad,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000 - (1_600_000_000 % 86400)
    rows = [(base, "n0", True)]  # day0 hod0 anchor (count 1)
    rows += [(base + 3 * 86400 + 23 * 3600, "n0", True)]  # day3 hod23
    for d in range(4):  # recurring 02:00 noise, identical every day
        rows += [
            (base + d * 86400 + 2 * 3600 + i, "n0", True)
            for i in range(10)
        ]
    rows += [  # the genuine spike: day2 at 05:00
        (base + 2 * 86400 + 5 * 3600 + i, "n0", True) for i in range(9)
    ]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error")
    out = error_seasonal_mad(logs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.node, r.hod, r.n_errors) == ("n0", 5, 9)
    assert r.hour_s == base + 2 * 86400 + 5 * 3600
    assert r.med_errors == 0.0 and r.mad_errors == 0.0


def test_theilsen_robust_to_outlier_day_unlike_ols(spark):
    """A linear 1-error/day ramp with one 500-error outlier day:
    Theil-Sen's median slope stays ~1/day (the Python-recomputed
    median of pairwise slopes), demonstrating the robustness OLS
    lacks."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        error_trend_theilsen,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000 - (1_600_000_000 % 86400)
    counts = {d: d + 1 for d in range(9)}
    counts[4] = 500  # the corrupted day
    rows = []
    for d, n in counts.items():
        rows += [(base + d * 86400 + i, "n0", True) for i in range(n)]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error")
    r = error_trend_theilsen(logs).collect()[0]
    assert r.n_days == 9 and r.n_pairs == 36
    # python recount: lower median of all 36 pairwise slopes
    days = sorted(counts)
    slopes = sorted(
        (counts[j] - counts[i]) / (j - i)
        for i in days for j in days if i < j
    )
    assert r.slope_per_day == slopes[(36 + 1) // 2 - 1]
    assert abs(r.slope_per_day) <= 2.0  # outlier did not drag it


def test_mannkendall_python_recount_with_ties(spark):
    """Crafted daily series WITH ties (0,1,1,3,2,3,3): S, the pair
    count, and the tie-corrected variance numerator all match a pure
    Python recount — and a strictly increasing series reads the
    maximum S = n(n-1)/2 with var18 = n(n-1)(2n+5)."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        error_trend_mannkendall,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000 - (1_600_000_000 % 86400)
    # the zero-filled grid spans first..last ERROR hour, so the series
    # must start and end with an error day; the interior zero day is
    # the grid's real contribution (it ties with nothing here)
    series = {"n0": [1, 1, 0, 3, 2, 3, 3], "n1": [1, 2, 3, 4, 5]}
    rows = []
    for node, xs in series.items():
        for d, n in enumerate(xs):
            rows += [(base + d * 86400 + i, node, True) for i in range(n)]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(
        F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error"
    )
    got = {r.node: r for r in error_trend_mannkendall(logs).collect()}
    for node, xs in series.items():
        n = len(xs)
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(n) for j in range(i + 1, n)
        )
        from collections import Counter

        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        r = got[node]
        assert (r.n_days, r.n_pairs, r.s_stat, r.var_num18) == (
            n, n * (n - 1) // 2, s, n * (n - 1) * (2 * n + 5) - tie
        ), node
    # the strictly increasing node attains the maximum S
    assert got["n1"].s_stat == got["n1"].n_pairs == 10
    assert got["n1"].var_num18 == 5 * 4 * 15


def test_new_template_alert_flags_only_trailing_window(spark):
    """Template A lives all span; template B first appears 2h before
    span end -> only B is_new. Masking collapses numeric variants."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        new_template_alert,
    )
    from datetime import datetime, timezone

    def t(day, hour):
        return datetime(2025, 1, 1 + day, hour, 0, 0)

    rows = [
        ("n0", "ERROR", f"GC pause of {100 + i}ms", t(0, 3), i)
        for i in range(3)
    ]
    rows += [("n1", "ERROR", "GC pause of 7ms", t(3, 1), 10)]
    rows += [
        ("n0", "WARN", "disk 91 percent full", t(3, 0), 11),
        ("n1", "WARN", "disk 97 percent full", t(3, 2), 12),  # span end
    ]
    out = {
        (r.level, r.template): r
        for r in new_template_alert(_logs_df(spark, rows)).collect()
    }
    assert len(out) == 2  # numeric masking collapsed every variant
    gc = out[("ERROR", "GC pause of <NUM>ms")]
    disk = out[("WARN", "disk <NUM> percent full")]
    assert gc.is_new == 0 and gc.n_occurrences == 4 and gc.n_nodes == 2
    assert disk.is_new == 1 and disk.n_occurrences == 2 and disk.n_nodes == 2


def test_cogroup_asof_hand_computed(spark):
    """Three errors: one 10s after a warning (matched), one with the
    warning exactly AT its timestamp (gap 0, matched), one 10min
    after (beyond horizon). A warning-free node yields zero matches."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        cogroup_error_warning_asof,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000
    rows = [  # (epoch, node, level)
        (base + 100, "n0", "WARN"),
        (base + 110, "n0", "ERROR"),   # gap 10s -> matched
        (base + 200, "n0", "WARN"),
        (base + 200, "n0", "ERROR"),   # gap 0 (same ts) -> matched
        (base + 200 + 600, "n0", "ERROR"),  # 600s > 300s horizon
        (base + 50, "n1", "ERROR"),    # node without warnings
    ]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, level string"
    ).select(
        F.col("epoch").cast("timestamp").alias("ts"),
        "node",
        (F.col("level") == "ERROR").alias("is_error"),
        (F.col("level") == "WARN").alias("is_warning"),
    )
    out = {r.node: r for r in cogroup_error_warning_asof(logs).collect()}
    assert out["n0"].n_errors == 3 and out["n0"].n_matched == 2
    assert out["n0"].sum_gap_ms == 10_000
    assert out["n1"].n_errors == 1 and out["n1"].n_matched == 0
    assert out["n1"].sum_gap_ms == 0


def test_heavy_changers_sees_quieted_and_louder(spark):
    """A template that stops at midpoint ranks as a negative delta; a
    template that starts after midpoint as positive; a steady one
    ranks last."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        template_heavy_changers,
    )

    base = datetime(2025, 1, 1, 0, 0, 0)

    def at(hours):
        return datetime(2025, 1, 1 + hours // 24, hours % 24, 0, 0)

    rows = []
    lid = 0
    for h in range(10):  # span 0..9h, mid at 4.5h
        rows += [("n0", "INFO", "heartbeat ok", at(h), lid)]; lid += 1
    for h in range(4):   # quiets: first half only, 3/hour
        rows += [("n0", "WARN", "queue depth 9 high", at(h), lid + i)
                 for i in range(3)]; lid += 3
    for h in range(5, 10):  # louder: second half only, 4/hour
        rows += [("n0", "ERROR", "disk 3 failing", at(h), lid + i)
                 for i in range(4)]; lid += 4
    out = template_heavy_changers(_logs_df(spark, rows)).collect()
    by = {r.template: r for r in out}
    assert by["disk <NUM> failing"].delta == 20
    assert by["queue depth <NUM> high"].delta == -12
    assert by["disk <NUM> failing"].rk == 1
    assert by["queue depth <NUM> high"].rk == 2
    hb = by["heartbeat ok"]
    assert hb.n_first == 5 and hb.n_second == 5 and hb.delta == 0


def test_pandas_udaf_median_even_and_odd_counts(spark):
    """GROUPED_AGG median on crafted series: odd count -> middle
    element; even count -> dyadic mean of middles (zero-fill
    included: node n1's silent middle hour counts as 0)."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        pandas_udaf_error_median,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000 - (1_600_000_000 % 3600)
    rows = []
    for h, n in enumerate([1, 5, 9]):  # n0: odd count, median 5
        rows += [(base + h * 3600 + i, "n0", True) for i in range(n)]
    for h, n in [(0, 2), (3, 7)]:  # n1: grid 0..3 -> [2,0,0,7], med 1.0
        rows += [(base + h * 3600 + i, "n1", True) for i in range(n)]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error")
    out = {r.node: r for r in pandas_udaf_error_median(logs).collect()}
    assert out["n0"].n_hours == 3 and out["n0"].med_hourly_errors == 5.0
    assert out["n1"].n_hours == 4 and out["n1"].med_hourly_errors == 1.0
    assert out["n1"].max_hourly_errors == 7


def test_seasonal_ols_separates_trend_from_weekend_cycle(spark):
    """Crafted series y = 10 + 2*t + 50*weekend over 21 days: the fit
    must recover slope 2 and weekend lift 50 exactly (integer data,
    exact normal equations), where 1-D OLS would smear the cycle into
    the slope. Degenerate node (single day) yields NULL estimates."""
    from fractions import Fraction

    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        error_trend_seasonal_ols,
    )
    from pyspark.sql import functions as F

    base_day = 1_600_041_600 // 86400  # a fixed epoch day
    rows = []
    for t in range(21):
        d = base_day + t
        w = 1 if (d + 4) % 7 in (0, 6) else 0
        y = 10 + 2 * t + 50 * w
        rows += [
            (d * 86400 + i, "n0", True) for i in range(y)
        ]
    rows += [(base_day * 86400, "n1", True)]  # singular design
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error")
    out = {r.node: r for r in error_trend_seasonal_ols(logs).collect()}
    r = out["n0"]
    assert r.n_days == 21 and r.det != 0
    assert Fraction(r.slope_num, r.det) == 2
    assert Fraction(r.weekend_num, r.det) == 50
    assert out["n1"].slope_per_day is None
    assert out["n1"].weekend_lift is None


def test_node_mtbf_hand_computed(spark):
    """Two incidents: starts 0s and 2000s (MTBF 2000), spans 240s and
    0s (MTTR 120), fleet span = first start to LAST EVENT (2000s), so
    availability = 1000*(2000-240)//2000 = 880. A single-incident
    node yields NULL MTBF."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        node_mtbf,
    )
    from pyspark.sql import functions as F

    base = 1_600_000_000
    rows = [
        (base, "n0", True), (base + 240, "n0", True),      # incident 1
        (base + 2000, "n0", True),                          # incident 2
        (base + 50, "n1", True),                            # single
    ]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error")
    out = {r.node: r for r in node_mtbf(logs).collect()}
    r = out["n0"]
    assert (r.n_incidents, r.mtbf_s, r.mttr_s) == (2, 2000, 120)
    assert r.availability_permille == 1000 * (2000 - 240) // 2000
    assert out["n1"].mtbf_s is None and out["n1"].n_incidents == 1


def test_interarrival_histogram_buckets_and_totals(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        error_interarrival_histogram,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged
    from pyspark.sql import functions as F

    logs = logs_flagged(spark, sf_dir)
    rows = error_interarrival_histogram(logs).collect()
    assert rows
    for r in rows:
        # bucket k holds gaps with floor(log2(gap+1)) == k:
        # [2^k - 1, 2^(k+1) - 1)
        lo, hi = (1 << r.gap_bucket) - 1, (1 << (r.gap_bucket + 1)) - 1
        assert lo <= r.min_gap_s <= r.max_gap_s < hi
        assert r.n_gaps >= 1
    # per node: number of gaps == number of error lines - 1
    per_node = {}
    for r in rows:
        per_node[r.node] = per_node.get(r.node, 0) + r.n_gaps
    errs = {
        r.node: r.n
        for r in logs.filter(F.col("is_error"))
        .groupBy("node")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for node, n_gaps in per_node.items():
        assert n_gaps == errs[node] - 1


def test_template_transitions_shares_and_floor(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        TEMPLATE_TRANSITION_MIN_N,
        template_transitions,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged

    rows = template_transitions(logs_flagged(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.n >= TEMPLATE_TRANSITION_MIN_N
        assert r.n <= r.n_out
        assert r.share_permille == 1000 * r.n // r.n_out
        assert "<NUM>" in r.prev or "<NUM>" in r.cur or True  # masking ran
    # out-degrees are per (node, prev): all rows of one group agree
    outs = {}
    for r in rows:
        outs.setdefault((r.node, r.prev), set()).add(r.n_out)
    assert all(len(v) == 1 for v in outs.values())


def test_value_ks_drift_known_distributions(spark, monkeypatch):
    """KS on a crafted two-era frame: early values {1,2,3,4}, late
    values {3,4,5,6} — D = 2/4 at x=2 (F_e=0.5, F_l=0)."""
    from datetime import datetime, timezone

    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    def t(h):
        return datetime(2024, 1, 1, h, tzinfo=timezone.utc)

    rows = [Row(event_type="t", ts=t(h), value=float(v))
            for h, v in [(0, 1), (1, 2), (2, 3), (3, 4)]]
    rows += [Row(event_type="t", ts=t(h), value=float(v))
             for h, v in [(20, 3), (21, 4), (22, 5), (23, 6)]]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(
        "cassandra_log_analyzer_mcp_spark.operators.analytics.table",
        lambda spark, sf_dir, name: df,
    )
    got = an.value_ks_drift(spark, "ignored").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_early, r.n_late) == (4, 4)
    # max |cum_e*n_l - cum_l*n_e| = |2*4 - 0*4| = 8 at value 2
    assert r.ks_num == 8 and r.at_value == 2.0
    assert r.d_stat == 8 / 16


def test_value_ks_drift_registry_shape(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    rows = an.value_ks_drift(spark, sf_dir).collect()
    assert rows, "fixture eras must produce one row per event type"
    for r in rows:
        assert 0.0 <= r.d_stat <= 1.0
        assert r.ks_num <= r.n_early * r.n_late


def test_benford_check_battery(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    rows = {r.digit: r for r in an.benford_check(spark, sf_dir).collect()}
    assert sorted(rows) == [str(d) for d in range(1, 10)]
    n = sum(r.observed for r in rows.values())
    # expectations scale with the observed total and the 9 shares
    # sum to ~1 (the literals truncate at 15dp)
    tot_exp = sum(r.expected for r in rows.values())
    assert abs(tot_exp - n) < 0.01 * n
    for r in rows.values():
        assert r.chi2_term >= 0.0


def test_mann_whitney_drift_known_u(spark, monkeypatch):
    """Crafted eras with a tie: early {1, 2}, late {2, 3} — midrank
    of the tied 2s is 2.5, so R1 = 1 + 2.5 = 3.5, U1 = 0.5,
    u2_stat = 1, auc = 0.125."""
    from datetime import datetime, timezone

    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    def t(h):
        return datetime(2024, 1, 1, h, tzinfo=timezone.utc)

    rows = [Row(event_type="t", ts=t(0), value=1.0),
            Row(event_type="t", ts=t(1), value=2.0),
            Row(event_type="t", ts=t(22), value=2.0),
            Row(event_type="t", ts=t(23), value=3.0)]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(
        "cassandra_log_analyzer_mcp_spark.operators.analytics.table",
        lambda spark, sf_dir, name: df,
    )
    r = an.mann_whitney_drift(spark, "ignored").collect()[0]
    assert (r.n_early, r.n_late, r.u2_stat, r.auc) == (2, 2, 1, 0.125)


def test_mann_whitney_drift_bounds(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    rows = an.mann_whitney_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.auc <= 1.0
        assert 0 <= r.u2_stat <= 2 * r.n_early * r.n_late


def test_drift_family_null_case_identical_eras(spark, monkeypatch):
    """Both eras drawn identical ⇒ KS numerator 0 and Mann-Whitney
    auc exactly 0.5 — the null-calibration property of the whole
    drift family (a biased estimator would shift these even on
    perfectly matched eras)."""
    from datetime import datetime, timezone

    from cassandra_log_analyzer_mcp_spark.operators import analytics as an

    def t(h):
        return datetime(2024, 1, 1, h, tzinfo=timezone.utc)

    vals = [1.0, 2.0, 2.0, 5.0, 9.0]
    rows = [Row(event_type="t", ts=t(h), value=v)
            for h, v in enumerate(vals)]
    rows += [Row(event_type="t", ts=t(19 + h), value=v)
             for h, v in enumerate(vals)]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(
        "cassandra_log_analyzer_mcp_spark.operators.analytics.table",
        lambda spark, sf_dir, name: df,
    )
    ks = an.value_ks_drift(spark, "ignored").collect()[0]
    assert (ks.ks_num, ks.d_stat) == (0, 0.0)
    mw = an.mann_whitney_drift(spark, "ignored").collect()[0]
    assert mw.auc == 0.5 and mw.u2_stat == mw.n_early * mw.n_late
