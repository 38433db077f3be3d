#!/usr/bin/env python3
"""Benchmark harness: times every registered query end-to-end.

Runs each ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Results are materialized with the noop sink so timings include full
execution (scan → shuffle → result) without driver collection cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cassandra_log_analyzer_mcp_spark.plans import registry
    from cassandra_log_analyzer_mcp_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    # Warm one-time session costs (JVM codegen, parquet footers, Python
    # worker pool for the Arrow stage) on the smallest inputs so the
    # measured entries reflect steady-state execution.
    for warm_name, warm_dir in [
        ("node_summary", sf_dir),
        ("multimodal_pipeline", "/root/testdata/sf0.001"),
    ]:
        try:
            qs[warm_name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query should not hide the rest
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": f"total_wall_sec_{len(timings)}_queries",
        "value": round(sum(t for t in timings.values() if t >= 0), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
