"""Run the streaming pipeline over the testdata and return its result
as a regular DataFrame — which makes the STREAMING path itself
oracle-checkable: the driver hash-compares readStream→parse→window
output against independent SQL.

Flow: synthesized raw lines land as per-node text files (what a log
shipper produces), a file-source stream consumes them with an
availableNow trigger into a memory sink, and the sink table is
returned. Event-time windowing, not arrival-time, so results are
deterministic regardless of batch boundaries.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parsing import synth_raw_lines
from ..sources.tables import table
from . import log_stream

_MATERIALIZED: dict[str, str] = {}


def _landed_log_dir(spark: SparkSession, sf_dir: str) -> str:
    """Land the synthesized raw lines as per-node log directories
    (once per sf_dir per process).

    Written BY SPARK (partitionBy node), not collected to the driver —
    the landing step must scale with the cluster, exactly like a real
    log shipper fleet writing to shared storage.
    """
    if sf_dir in _MATERIALIZED:
        return _MATERIALIZED[sf_dir]
    base = os.path.join(tempfile.mkdtemp(prefix="landed_logs_"), "logs")
    (
        synth_raw_lines(table(spark, sf_dir, "events"))
        .select("node", F.col("raw").alias("value"))
        .repartition("node")
        .write.partitionBy("node")
        .text(base)
    )
    _MATERIALIZED[sf_dir] = base
    return base


def streaming_issue_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly (node, level) issue counts computed BY THE STREAM.

    Same output contract as a batch hourly rollup, so the DuckDB
    oracle verifies the whole streaming path (source → parser →
    classifier → event-time window) value-for-value.
    """
    log_dir = _landed_log_dir(spark, sf_dir)
    lines = log_stream.stream_log_dir(
        spark, f"{log_dir}/node=*/*.txt", node_regex=r".*/node=([^/]+)/[^/]+$"
    )
    counts = log_stream.windowed_issue_counts(
        log_stream.parsed_stream(lines), window="1 hour", watermark="2 hours"
    )
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = log_stream.run_to_memory_sink(counts, sink, output_mode="complete")
    q.awaitTermination(300)
    return spark.table(sink).select(
        F.date_format("win_start", "yyyy-MM-dd HH:00:00").alias("hour"),
        "node",
        "level",
        F.col("n").cast("long").alias("n"),
        F.col("errors").cast("long").alias("errors"),
    )
