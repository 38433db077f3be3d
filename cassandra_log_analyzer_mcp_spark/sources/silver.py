"""Materialized silver layer: parsed+classified logs as partitioned
parquet.

The in-session cache (sources/tables.logs_flagged) is the small-scale
stand-in; at 100 TB the parse+classify output is written ONCE as
parquet partitioned by (log_date, node) and every analysis query reads
the silver table instead of reparsing raw text. Partition pruning then
turns "errors on node3 yesterday" into a scan of one directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parsing import with_issue_flags
from .tables import logs


def write_silver(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Parse+classify once and write partitioned by (log_date, node).

    The pre-write repartition on the partition columns routes each
    (log_date, node) directory's rows to one task — without it every
    parallel task emits a file into every directory it touches (the
    classic small-file blowup on partitioned writes).
    """
    flagged = with_issue_flags(logs(spark, sf_dir)).withColumn(
        "log_date", F.to_date("ts")
    )
    (
        flagged.repartition("log_date", "node")
        .write.mode("overwrite")
        .partitionBy("log_date", "node")
        .parquet(path)
    )
    return path


def read_silver(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
