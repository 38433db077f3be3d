"""PySpark-native log-analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference MCP server ``NLatarche/cassandra-log-analyzer-mcp``
(``/root/reference/cassandra_log_analyzer.py``): Cassandra log parsing,
issue classification, cluster analysis, search — plus the
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB data platform needs.

All hot-path logic is expressed as Spark Column expressions / DataFrame
plans so Catalyst + Tungsten (pushdown, pruning, whole-stage codegen,
AQE) do the heavy lifting; Python executes nothing per-row except the
deliberately-stubbed multimodal decode (Arrow-batched mapInPandas).
"""

__version__ = "0.1.0"

from .session import clear_caches, get_spark, tune  # noqa: E402,F401
