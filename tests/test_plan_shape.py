"""Plan-shape assertions: the optimizations we rely on at scale must be
visible in the physical plan (pushdown, pruning, broadcast)."""

from cassandra_log_analyzer_mcp_spark.operators import (
    analytics,
    curation,
    similarity,
    textops,
)


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


def test_ann_ivf_probe_join_is_broadcast(spark, sf_dir):
    """The probe list must broadcast: a shuffle join there would
    repartition the whole corpus per query batch."""
    plan = _plan(similarity.ann_ivf_cosine(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # argmax assignment is an aggregate (struct-max lowers to
    # SortAggregate — partial combine still collapses the 16 candidate
    # rows per vector before any shuffle), never a per-vector window
    assert "SortAggregate" in plan or "HashAggregate" in plan


def test_corpus_curation_filters_before_join(spark, sf_dir):
    plan = _plan(curation.corpus_curation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # quality/token gates are plain Filters above the scan, not
    # post-join — the join input is the curated subset
    join_pos = plan.find("Join")
    filt_pos = plan.find("Filter")
    assert filt_pos != -1 and (join_pos == -1 or filt_pos > 0)
    assert "PushedFilters" in plan


def test_vocab_top_k_never_global_sorts(spark, sf_dir):
    plan = _plan(textops.vocab_top_tokens(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_event_funnel_single_user_shuffle(spark, sf_dir):
    """All three stage windows and the per-user collapse must share
    ONE user_id Exchange; the only other exchange is the tiny
    SinglePartition for the 3-value global agg."""
    plan = _plan(analytics.event_funnel(spark, sf_dir))
    assert plan.count("Arguments: hashpartitioning") == 1
    assert plan.count("Arguments: SinglePartition") == 1
    assert plan.count(") Window") == 3  # detail header per Window node


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The training corpus must never shuffle — the (tiny) eval
    shingle set broadcasts to it."""
    plan = _plan(curation.decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
