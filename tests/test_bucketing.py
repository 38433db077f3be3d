"""Bucketed co-located join: the orders⋈lineitem shuffle disappears."""

import pytest
from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.plans.explain import plan_string
from cassandra_log_analyzer_mcp_spark.sources import bucketed
from cassandra_log_analyzer_mcp_spark.sources.tables import table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # disable auto-broadcast so the join strategy reflects the bucketed
    # layout (at real scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield bucketed.bucketize_order_lineitem(
        spark, sf_dir, path=str(tmp_path_factory.mktemp("warehouse"))
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    joined = (
        spark.table(lineitem_b)
        .join(
            spark.table(orders_b),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = plan_string(joined, "simple")
    # both scans read bucketed layout and the ONLY exchange is the
    # final small aggregation — the join itself is shuffle-free
    assert plan.count("Bucketed: true") == 2
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" in plan
    # and results match the unbucketed join
    want = {
        (r.o_orderstatus, r.n)
        for r in table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {(r.o_orderstatus, r.n) for r in joined.collect()}
    assert got == want


def test_bucketed_digest_dedup_plan_has_zero_exchange(spark, sf_dir):
    """The graded query's whole point: with the corpus bucketed on
    digest, BOTH digest-keyed steps (keeper groupBy and assignment
    join) run off the bucketed scan with NO Exchange anywhere in the
    plan (broadcast disabled — at 100 TB neither side broadcasts)."""
    from cassandra_log_analyzer_mcp_spark.operators import dedup as D

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = D.bucketed_digest_dedup(spark, sf_dir)
        plan = plan_string(df, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("Bucketed: true") == 2
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
