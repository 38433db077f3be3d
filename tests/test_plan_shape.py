"""Plan-shape assertions: the optimizations we rely on at scale must be
visible in the physical plan (pushdown, pruning, broadcast)."""

from cassandra_log_analyzer_mcp_spark.operators import analytics


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_pushes_filter_and_prunes(spark, sf_dir):
    plan = _plan(analytics.pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: unused columns don't reach the scan
    assert "l_partkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_regional_revenue_broadcasts_dims(spark, sf_dir):
    plan = _plan(analytics.regional_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    # the only shuffle joins are fact-fact
    assert plan.count("SortMergeJoin") <= 1


def test_shipping_priority_broadcasts_customer(spark, sf_dir):
    plan = _plan(analytics.shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
