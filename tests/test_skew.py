"""Salted aggregation equals the direct aggregation, including on a
pathologically skewed key distribution."""

from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    # 90% of rows on one key
    df = spark.range(0, 100000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("key"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    got = {
        r.key: (r.total, r.n, r.vmax)
        for r in salted_agg(
            df,
            ["key"],
            {
                "total": ("sum", F.sum("v")),
                "n": ("count", F.count("*")),
                "vmax": ("max", F.max("v")),
            },
        ).collect()
    }
    want = {
        r.key: (r.total, r.n, r.vmax)
        for r in df.groupBy("key")
        .agg(
            F.sum("v").alias("total"),
            F.count("*").alias("n"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][2] == want[k][2]
        assert abs(got[k][0] - want[k][0]) < 1e-6 * max(1.0, abs(want[k][0]))


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _skewed_logs(spark, n=200_000, hot_share=0.9):
    """Deliberately skewed log fixture: one node emits 90% of all
    lines (the 'one node spewing' case the salting exists for)."""
    hot_mod = int(1 / (1 - hot_share))
    return spark.range(0, n).select(
        F.when(F.col("id") % hot_mod < hot_mod - 1, "node-hot")
        .otherwise(F.concat(F.lit("node"), (F.col("id") % 5).cast("string")))
        .alias("node"),
        (F.col("id") % 17 == 0).alias("is_error"),
        (F.col("id") % 11 == 0).alias("is_warning"),
    )


def _node_summary_salted(logs):
    return salted_agg(
        logs,
        ["node"],
        {
            "errors": ("sum", F.sum(F.col("is_error").cast("long"))),
            "warnings": ("sum", F.sum(F.col("is_warning").cast("long"))),
            "total_lines": ("count", F.count("*")),
        },
    )


def test_skew_stress_salted_agg_exact_on_90pct_hot_node(spark):
    """The registry's node_summary_salted shape, on the skewed
    fixture: per-node results must equal the direct aggregation
    exactly (integer counts — no float tolerance)."""
    logs = _skewed_logs(spark)
    got = {
        r.node: (r.errors, r.warnings, r.total_lines)
        for r in _node_summary_salted(logs).collect()
    }
    want = {
        r.node: (r.errors, r.warnings, r.total_lines)
        for r in logs.groupBy("node")
        .agg(
            F.sum(F.col("is_error").cast("long")).alias("errors"),
            F.sum(F.col("is_warning").cast("long")).alias("warnings"),
            F.count("*").alias("total_lines"),
        )
        .collect()
    }
    assert got == want
    # the fixture really is skewed: hot node carries ~90% of lines
    total = sum(v[2] for v in want.values())
    assert want["node-hot"][2] >= 0.85 * total


def test_skew_stress_salted_agg_plan_is_two_stage(spark):
    """The treatment itself, pinned in the physical plan: the first
    exchange partitions on (node, _salt) — the hot key sprays across
    salt buckets — and a second exchange combines partials on node
    alone. Removing the salting collapses the plan to one node-keyed
    exchange and this test fails."""
    plan = _plan(_node_summary_salted(_skewed_logs(spark)))
    salted_exchanges = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning" in ln and "_salt" in ln
    ]
    assert salted_exchanges, plan
    # the combine stage must re-aggregate WITHOUT the salt
    final_exchanges = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(node" in ln and "_salt" not in ln
    ]
    assert final_exchanges, plan


def test_skew_stress_salted_join_exact_and_sprayed(spark):
    """salted_join on a fact whose hot key is 90% of rows: row-exact
    vs the plain join, and the join condition in the plan carries the
    salt equality (the spray) — remove the treatment and the salt
    columns vanish from the plan."""
    from cassandra_log_analyzer_mcp_spark.operators.skew import salted_join

    fact = spark.range(0, 50_000).select(
        F.when(F.col("id") % 10 < 9, 7)
        .otherwise((F.col("id") % 13).cast("long"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(0, 13).select(
        F.col("id").alias("ok"), (F.col("id") * 100).alias("dim")
    )
    j = salted_join(fact, other, "k", "ok")
    assert j.count() == fact.join(other, fact.k == other.ok).count()
    got = j.groupBy("k").agg(F.sum("dim").alias("s")).collect()
    want = (
        fact.join(other, fact.k == other.ok)
        .groupBy("k")
        .agg(F.sum("dim").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    plan = _plan(j)
    assert "_salt_l" in plan and "_salt_r" in plan, plan


def test_skew_stress_surprisal_hot_tier_is_broadcast_in_plan(
    spark, sf_dir, monkeypatch
):
    """The mega-gram fixture (one bigram in every doc) must route its
    join through an explicit broadcast exchange — the df-tier split's
    hot arm. Removing the split leaves one shuffle gram join and no
    broadcast of the hot counts, failing this plan assert (the
    value-equality twin lives in test_text_dedup)."""
    from pyspark.sql import Row

    import cassandra_log_analyzer_mcp_spark.operators.textops as t

    rows = [
        Row(doc_id=i, text=f"common pair u{i}a u{i}b u{i}c")
        for i in range(30)
    ]
    monkeypatch.setattr(t, "documents", lambda s, d: s.createDataFrame(rows))
    plan = _plan(t.doc_surprisal(spark, sf_dir, hot_c=5))
    assert "BroadcastExchange" in plan, plan
    # both tiers exist: a union of the cold shuffle arm + hot arm
    assert "Union" in plan, plan


def test_skew_gate_artifact_is_green():
    """The measured skew-stress gate (tools/skew_gate.py, VERDICT r5
    ask #2): spread vs pathological drops with identical work volume
    at sf0.1 — the committed artifact must show every treated
    operator inside its 2x budget and the salted agg integer-exact
    on the 90%-hot drop. Re-run the gate itself with
    `python tools/skew_gate.py /root/testdata/sf0.1` (the driver can
    replay it; ~90 s)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_GATE_r08.json",
    )
    with open(path) as fh:
        gate = json.load(fh)
    assert gate["pass"] is True
    assert gate["salted_agg_exact_on_skew"] is True
    assert gate["drops"]["skew"]["hot_node_share"] >= 0.85
    assert gate["drops"]["spread"]["hot_node_share"] <= 0.5
    expected = {
        "node_summary_salted",
        "doc_surprisal",
        "repeated_span_coverage",
        "repeated_spans_merged",
    }
    assert set(gate["ops"]) == expected
    for op, row in gate["ops"].items():
        assert row["pass"], op
        assert row["skew_s"] <= row["budget_s"], op
    # round 8: the band-index gate (VERDICT r7 ask #3) — the planted
    # mega-bucket drop must pass its 2x budget under the
    # BAND_MAX_OCCUPANCY guard, the guard must be inert on the
    # spread twin, and the uncapped counterfactual must document the
    # quadratic blow-up the guard removes
    band = gate["band_index_gate"]
    assert band["pass"] is True
    assert band["cap_inert_on_spread"] is True
    assert band["capped_subset_on_skew"] is True
    assert (
        band["drops"]["bandskew"]["max_band_occupancy"]
        >= band["n_docs"] // 20
    )
    assert (
        band["drops"]["bandspread"]["max_band_occupancy"]
        <= band["band_max_occupancy_cap"]
    )
    assert set(band["ops"]) == {"dedup_minhash_lsh", "dedup_incremental"}
    for op, row in band["ops"].items():
        assert row["pass"], op
    assert band["uncapped_vs_capped_skew_ratio"] > 2.0


def test_band_candidates_hot_bucket_guard(spark):
    """_band_candidates semantics, pinned on a crafted index: a
    bucket over BAND_MAX_OCCUPANCY contributes NO pairs (its members
    pair only through their cold buckets); cold buckets pair fully."""
    from cassandra_log_analyzer_mcp_spark.operators.dedup import (
        BAND_MAX_OCCUPANCY,
        _band_candidates,
    )

    hot_n = BAND_MAX_OCCUPANCY + 6
    rows = [(i, "hot") for i in range(hot_n)]
    rows += [(i, "cold") for i in (0, 1, 500)]
    buckets = spark.createDataFrame(rows, "doc_id long, band string")
    got = {
        (r.da, r.db)
        for r in _band_candidates(buckets).collect()
    }
    # only the cold bucket's C(3,2) pairs survive — including the
    # (0, 1) pair whose members ALSO sit in the hot bucket
    assert got == {(0, 1), (0, 500), (1, 500)}
    # exactly at the cap the bucket is kept (the guard is >, not >=)
    at_cap = spark.createDataFrame(
        [(i, "edge") for i in range(BAND_MAX_OCCUPANCY)],
        "doc_id long, band string",
    )
    n = _band_candidates(at_cap).count()
    assert n == BAND_MAX_OCCUPANCY * (BAND_MAX_OCCUPANCY - 1) // 2
