#!/usr/bin/env python3
"""Per-query profiler for the optimization rounds.

For each named query: build the frame, dump ``explain('formatted')``
to ``plans/<tag>/<name>_<suffix>.txt``, then time N noop-sink runs
(guide §1.4) with a job description label (guide §1.5). The FIRST
timed run follows a warm run at sf0.001 exactly like bench.py, so the
numbers are comparable to the bench's marginal accounting (shared
layers pre-built here too).

Usage:
    python tools/qprof.py [--sf SF_DIR] [--tag r10] [--suffix before]
                          [--reps 3] [--no-plan] query [query ...]

Prints one JSON line: {"queries": {name: [sec, ...]}, "sf": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from cassandra_log_analyzer_mcp_spark.plans import registry
    from cassandra_log_analyzer_mcp_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="qprof",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    # same shared-layer pre-build as bench.py (marginal accounting)
    from cassandra_log_analyzer_mcp_spark.operators.dedup import (
        _doc_shingle_arrays,
    )
    from cassandra_log_analyzer_mcp_spark.sources.silver import silver_path
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged
    from cassandra_log_analyzer_mcp_spark.streaming.batch_bridge import (
        _landed_silver_dir,
    )

    logs_flagged(spark, args.sf).write.format("noop").mode(
        "overwrite").save()
    _doc_shingle_arrays(spark, args.sf).write.format("noop").mode(
        "overwrite").save()
    _landed_silver_dir(spark, args.sf)
    silver_path(spark, args.sf)
    needs_kmeans = any(
        n.startswith(("ann_", "kmeans", "knn", "embedding", "decontaminate"))
        for n in args.queries
    )
    if needs_kmeans:
        from cassandra_log_analyzer_mcp_spark.operators.similarity import (
            kmeans_assignments,
            kmeans_centroid_state,
        )

        kmeans_assignments(spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        kmeans_centroid_state(spark, args.sf)

    warm_dir = "/root/testdata/sf0.001"
    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = qs[name]
        if not args.no_warm:
            try:
                fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
        if not args.no_plan:
            try:
                df = fn(spark, args.sf)
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
                with open(
                    os.path.join(
                        plan_dir, f"{name}_{args.suffix}.txt"
                    ),
                    "w",
                ) as f:
                    f.write(txt)
            except Exception as e:
                print(f"plan capture failed for {name}: {e}",
                      file=sys.stderr)
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(
                f"qprof:{name}:rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps({"queries": out, "sf": args.sf}))


if __name__ == "__main__":
    main()
