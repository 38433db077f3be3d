"""Property evidence for the closed-form rewrites: the window
formulations must equal the textbook sequential definitions on
randomized inputs (seeded — deterministic across runs). Each test
ships ALL its random cases through ONE Spark job (hypothesis-per-
example would pay the JVM roundtrip per case)."""

import random

from pyspark.sql import functions as F


def test_cusum_closed_form_equals_recursion_on_random_series(spark):
    """S_t = P_t − min(0, min_{j≤t} P_j) (two windows) must equal the
    textbook recursion S_t = max(0, S_{t−1} + x_t − k) for every
    prefix, on 40 random integer series driven through the REAL
    operator as 40 synthetic nodes."""
    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        CUSUM_H_MULT,
        error_cusum_changepoints,
    )

    rng = random.Random(20260814)
    base = 1_700_000_000 - (1_700_000_000 % 3600)
    rows = []
    series = {}
    for n in range(40):
        node = f"s{n:02d}"
        hours = rng.randint(4, 30)
        xs = [rng.randint(0, 12) for _ in range(hours)]
        # ensure first/last hour nonempty so the operator's observed
        # [h0, h1] span equals the intended series (zero-fill covers
        # interior gaps, which the series generator creates via 0s)
        xs[0] = max(xs[0], 1)
        xs[-1] = max(xs[-1], 1)
        series[node] = xs
        for hr, x in enumerate(xs):
            rows += [
                (base + hr * 3600 + i, node, True) for i in range(x)
            ]
    logs = spark.createDataFrame(
        rows, "epoch long, node string, is_error boolean"
    ).select(
        F.col("epoch").cast("timestamp").alias("ts"), "node", "is_error"
    )
    got = {
        (r.node, r.hour_s): (r.n_errors, r.cusum, r.k_ref)
        for r in error_cusum_changepoints(logs).collect()
    }

    expect = {}
    for node, xs in series.items():
        tot, slots = sum(xs), len(xs)
        k = -(-tot // slots)  # ceil div
        s = 0
        for hr, x in enumerate(xs):
            s = max(0, s + x - k)  # textbook recursion
            if s > CUSUM_H_MULT * k:
                expect[(node, base + hr * 3600)] = (x, s, k)
    assert got == expect and expect  # non-vacuous


def test_skyline_matches_brute_force_on_random_points(spark):
    """The banded two-stage frontier must equal O(n²) dominance on
    random point sets WITH engineered ties (duplicate points, shared
    q values, shared t values)."""
    from cassandra_log_analyzer_mcp_spark.operators.textops import (
        pareto_frontier,
    )

    rng = random.Random(4)
    pts = []
    for i in range(200):
        q = round(rng.uniform(0, 1), 2)  # coarse grid → many q ties
        t = rng.randint(1, 40)           # many t ties
        pts.append((i, t, q))
    pts += [(1000 + i, t, q) for i, (_, t, q) in enumerate(pts[:20])]

    feats = spark.createDataFrame(pts, "doc_id long, t long, q double")
    got = {r.doc_id for r in pareto_frontier(feats).collect()}
    brute = {
        a[0]
        for a in pts
        if not any(
            b[2] >= a[2] and b[1] <= a[1] and (b[2] > a[2] or b[1] < a[1])
            for b in pts
        )
    }
    assert got == brute and brute


def test_dp_geometric_sampler_is_calibrated():
    """The log-free geometric sampler must have the distribution its
    ε-claim assumes: leading-1-bit counts of uniform hashes follow
    P[mag ≥ k] = 2^-k, so E[mag] = 1 and P[mag = 0] = 1/2. Checked in
    pure Python over 20k keys (no Spark — this pins the MATH, the
    gate pins the engine parity)."""
    import hashlib

    mags = []
    for i in range(20_000):
        h = hashlib.md5(f"dp-v1:key{i}".encode()).hexdigest()
        bits = bin(int(h[:15], 16))[2:].zfill(60)
        mags.append(len(bits) - len(bits.lstrip("1")))
    n = len(mags)
    mean = sum(mags) / n
    p0 = sum(1 for m in mags if m == 0) / n
    assert 0.93 < mean < 1.07
    assert 0.48 < p0 < 0.52


def test_trend_closed_form_matches_numpy_and_survives_int64_overflow(spark):
    """trend_from_moments' Faulhaber completion vs a brute-force
    zero-filled polyfit on random sparse series — and a 3-year-span
    node whose n·Σt² and (Σt)² intermediates exceed int64, proving
    the DECIMAL(38) path keeps the integers exact."""
    from fractions import Fraction

    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        trend_from_moments,
    )

    rng = random.Random(7)
    rows = []
    expect = {}
    cases = {"short": 120, "long": 26_280}  # hours; long ≈ 3 years
    for name, span in cases.items():
        t0 = 490_000 + rng.randrange(1000)
        obs = sorted(
            rng.sample(range(t0, t0 + span), k=min(60, span // 2))
        )
        obs = [t0, *obs, t0 + span - 1]  # pin the exact bounds
        xs = [rng.randrange(1, 50) for _ in obs]
        rows.append((
            name, obs[0], obs[-1], sum(xs),
            sum(t * x for t, x in zip(obs, xs)),
        ))
        # brute force on the zero-filled grid, exact rationals
        grid = {t: 0 for t in range(obs[0], obs[-1] + 1)}
        for t, x in zip(obs, xs):
            grid[t] += x
        n = len(grid)
        st, sy = sum(grid), sum(grid.values())
        sty = sum(t * x for t, x in grid.items())
        stt = sum(t * t for t in grid)
        expect[name] = (n * sty - st * sy, n * stt - st * st)
        if name == "long":
            assert n * stt > 2**63  # the overflow regime is real
    moments = spark.createDataFrame(
        rows, "node string, t0 long, t1 long, sy long, sty long"
    )
    got = {r.node: r for r in trend_from_moments(moments).collect()}
    for name, (num, den) in expect.items():
        assert (got[name].slope_num, got[name].slope_den) == (num, den)
        assert got[name].trend == (
            "degrading" if num > 0 else "improving" if num < 0 else "flat"
        )
        # and the rational slope matches an independent formulation
        assert Fraction(num, den) == Fraction(
            got[name].slope_num, got[name].slope_den
        )


def test_lead_lag_matches_brute_force(spark):
    """node_lead_lag on a hand-built log frame vs a pure-Python
    cross-correlation: planted propagation (nodeA's spikes echo in
    nodeB exactly 2 h later) must surface as best_lag_h=2, and every
    (pair, lag) score must equal the brute-force dot product."""
    from pyspark.sql import functions as F

    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        LEADLAG_MAX_H,
        node_lead_lag,
    )

    base = 1_700_000_000 - (1_700_000_000 % 3600)
    series = {
        "nodeA": {0: 5, 3: 7, 8: 4},
        "nodeB": {2: 6, 5: 8, 10: 3},   # = A shifted by 2h (±noise)
        "nodeC": {1: 2},
    }
    rows = []
    i = 0
    for node, hs in series.items():
        for h, n in hs.items():
            for _ in range(n):
                rows.append((i, node, base + h * 3600 + 7, True))
                i += 1
    logs = spark.createDataFrame(
        rows, "line_id long, node string, epoch long, is_error boolean"
    ).select(
        "line_id", "node",
        F.col("epoch").cast("timestamp").alias("ts"), "is_error",
    )
    out = {(r.node_a, r.node_b): r for r in node_lead_lag(logs).collect()}

    def score(a, b, lag):
        return sum(
            v * series[b].get(h + lag, 0) for h, v in series[a].items()
        )

    for a in series:
        for b in series:
            if a == b:
                continue
            best = max(
                range(LEADLAG_MAX_H + 1),
                key=lambda l: (score(a, b, l), -l),
            )
            r = out[(a, b)]
            assert (r.best_lag_h, r.best_score, r.score_lag0) == (
                best, score(a, b, best), score(a, b, 0)
            )
    assert out[("nodeA", "nodeB")].best_lag_h == 2


def test_kmv_merge_and_accuracy():
    """KMV invariants: merging two k-sets (union → k smallest)
    equals the sketch of the union, the exact branch fires below k,
    and the estimator lands within 4/√k relative error on a 20k-id
    universe (driver-side pure Python — the estimator maths, not the
    plan, is under test here)."""
    import hashlib

    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        KMV_K,
        KMV_SPACE,
    )

    def h(u):
        return int(
            hashlib.md5(f"{u}:kmv".encode()).hexdigest()[:12], 16
        )

    def sketch(users):
        return sorted(h(u) for u in set(users))[:KMV_K]

    def estimate(sk, n_kept):
        if n_kept < KMV_K:
            return n_kept
        return (KMV_K - 1) * KMV_SPACE // sk[-1]

    a = list(range(0, 12_000))
    b = list(range(8_000, 20_000))
    merged = sorted(set(sketch(a)) | set(sketch(b)))[:KMV_K]
    assert merged == sketch(a + b)  # mergeability

    small = sketch(range(KMV_K - 10))
    assert estimate(small, len(small)) == KMV_K - 10  # exact branch

    full = sketch(a + b)
    est = estimate(full, KMV_K)
    assert abs(est - 20_000) / 20_000 < 4 / (KMV_K ** 0.5)


def test_forecast_equals_fraction_arithmetic(spark):
    """The forecast's (num, den) pair must equal intercept + slope ·
    (t1+24) computed with exact Fractions from the raw moments, and
    the 'rising' verdict must match the cross-product rule."""
    from fractions import Fraction

    from cassandra_log_analyzer_mcp_spark.operators.analysis import (
        FORECAST_H,
        error_forecast_next_day,
        trend_moments,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged

    sf_dir = "/root/testdata/sf0.01"
    logs = logs_flagged(spark, sf_dir)
    moments = {r.node: r for r in trend_moments(logs).collect()}
    out = {r.node: r for r in error_forecast_next_day(logs).collect()}
    for node, m in moments.items():
        n = m.t1 - m.t0 + 1
        st = (m.t0 + m.t1) * n // 2
        stt = (
            m.t1 * (m.t1 + 1) * (2 * m.t1 + 1)
            - (m.t0 - 1) * m.t0 * (2 * m.t0 - 1)
        ) // 6
        den = n * stt - st * st
        slope = Fraction(n * m.sty - st * m.sy, den)
        icept = Fraction(m.sy * stt - st * m.sty, den)
        yhat = icept + slope * (m.t1 + FORECAST_H)
        r = out[node]
        assert Fraction(r.yhat_num, r.yhat_den) == yhat
        assert r.t_star == m.t1 + FORECAST_H
        assert r.outlook == (
            "rising" if yhat > Fraction(m.sy, n) else "easing"
        )


def test_rfm_segments_cover_users_and_bound_quartiles(spark, sf_dir):
    """Segment cube must partition the user base exactly; segments lie
    in 1..4; each metric's marginal seg-1 share is >= 1/4 (ties can
    only GROW the boundary bucket, never shrink it below the exact
    quartile rank)."""
    from pyspark.sql import functions as F

    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        user_rfm_segments,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import table

    rows = user_rfm_segments(spark, sf_dir).collect()
    n_users_true = (
        table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    assert sum(r.n_users for r in rows) == n_users_true
    for r in rows:
        assert 1 <= r.r_seg <= 4 and 1 <= r.f_seg <= 4 and 1 <= r.m_seg <= 4
    for axis in ("r_seg", "f_seg", "m_seg"):
        seg1 = sum(r.n_users for r in rows if getattr(r, axis) == 1)
        assert 4 * seg1 >= n_users_true


def test_ks_mw_decimal_path_survives_int64_overflow(spark):
    """value_ks_drift / mann_whitney_drift's decimal(38,0) numerators
    vs exact pure-Python integers, on planted era counts whose
    INTERMEDIATE products exceed int64 while the statistics themselves
    still fit — the regime where the pre-r9 long arithmetic wrapped
    silently (VERDICT r8 #3; same pattern as the trend n·Σt² test)."""
    import pytest

    from cassandra_log_analyzer_mcp_spark.operators.analytics import (
        ks_from_value_counts,
        mw_from_value_counts,
    )

    # --- KS: near-proportional eras, 8e9 events per side ---
    vals = [1.0, 2.0, 3.0]
    n_e = [4_000_000_000, 3_000_000_000, 1_000_000_000]
    n_l = [3_999_999_000, 2_999_999_000, 1_000_002_000]
    ne_t, nl_t = sum(n_e), sum(n_l)
    cum_e = [sum(n_e[: i + 1]) for i in range(3)]
    cum_l = [sum(n_l[: i + 1]) for i in range(3)]
    nums = [abs(a * nl_t - b * ne_t) for a, b in zip(cum_e, cum_l)]
    exp_ks = max(nums)
    assert cum_e[0] * nl_t > 2**63  # intermediate overflow regime
    assert exp_ks < 2**63  # ...while the statistic fits
    per_val = spark.createDataFrame(
        [("t", v, e, l) for v, e, l in zip(vals, n_e, n_l)],
        "event_type string, value double, n_e long, n_l long",
    )
    row = ks_from_value_counts(per_val).collect()[0]
    assert (row.n_early, row.n_late) == (ne_t, nl_t)
    assert row.ks_num == exp_ks
    assert row.at_value == vals[nums.index(exp_ks)]
    assert row.d_stat == pytest.approx(exp_ks / (ne_t * nl_t), rel=1e-12)

    # --- MW: unbalanced eras so r1x2 >> u2 ---
    e = [4_000_000_000, 3_000_000_000, 1_000_000_000]
    l = [200_000_000, 200_000_000, 100_000_000]
    n1, n2 = sum(e), sum(l)
    c_prev, r1x2 = 0, 0
    for ei, li in zip(e, l):
        r1x2 += ei * (2 * c_prev + ei + li + 1)
        c_prev += ei + li
    exp_u2 = r1x2 - n1 * (n1 + 1)
    assert r1x2 > 2**63  # intermediate overflow regime
    assert 0 <= exp_u2 < 2**63  # ...while the statistic fits
    per_val = spark.createDataFrame(
        [("t", v, a, b) for v, a, b in zip(vals, e, l)],
        "event_type string, value double, e long, l long",
    )
    row = mw_from_value_counts(per_val).collect()[0]
    assert (row.n_early, row.n_late) == (n1, n2)
    assert row.u2_stat == exp_u2
    assert row.auc == pytest.approx(exp_u2 / (2 * n1 * n2), rel=1e-12)
