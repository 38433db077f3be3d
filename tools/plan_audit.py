#!/usr/bin/env python3
"""Physical-plan audit: one row per registry query with the plan
features that matter at 100 TB — shuffle count, join strategies,
window nodes, codegen spans, and whether scan pushdown/pruning made it
into the parquet reader.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries that execute work at build time (driver-loop iteration or an
#: actual streaming run) — they have no single lazily-inspectable plan.
EAGER = {
    "dedup_clusters",
    "dedup_canonical",  # contains dedup_clusters' driver loop
    "dedup_soft_weights",  # composes dedup_clusters' driver loop
    "dedup_cluster_size_histogram",  # composes the same driver loop
    "bpe_train_merges",  # per-round argmax collect driver loop
    # runs its availableNow stream at build time; the returned frame
    # is a driver-local createDataFrame of the digest state
    "streaming_percentiles_tdigest",
    "streaming_asof_join",  # availableNow run at build; memory sink
    "streaming_issue_counts",
    "streaming_kafka_issue_counts",
    "streaming_error_bursts",
    "streaming_dedup_incremental",
    "streaming_windowed_alerts",
    "streaming_error_sessions",
    "streaming_silver_counts",
    "streaming_purchase_error_join",
    "streaming_purchase_error_left_join",
    "streaming_purchase_error_full_join",
    "streaming_topk_tokens",  # availableNow run; driver-state result
    "streaming_dedup_watermarked",  # availableNow run; memory sink
    "streaming_cusum_alerts",  # availableNow run; driver-state fold
    "streaming_rack_counts",  # availableNow run; memory sink
    "streaming_dlq_counts",  # availableNow run; parquet fork sinks
    "streaming_trend_state",  # availableNow run; driver moments fold
    "streaming_kmv_state",  # availableNow run; driver k-set fold
    "streaming_priority_sample",  # availableNow run; bottom-K fold
    "streaming_funnel_state",  # availableNow run; per-user state fold
    "streaming_late_data_drop",  # availableNow run; memory sink
    "streaming_f2_ams",  # availableNow run; driver counter fold
    "streaming_seasonal_mad",  # availableNow run; additive rollup fold
    # writes the text landing then registers the Python DataSource;
    # the final node_summary plan is lazily inspectable, but the
    # build-time write makes the whole query eager-shaped
    "python_datasource_node_summary",
    # the BIG embeddings regime writes its generated 50k-vector drop
    # at build time (generate-once parquet, like the landing above);
    # downstream plans are the graded IVF/PQ shapes already audited
    # on the shipped table
    "ann_ivf_probe_sweep_big",
    "ann_ivf_big_cell_stats",
    "ann_ivf_pq_recall_big",
    # the BIG documents regime writes its generated 50k-doc drop at
    # build time (same generate-once parquet pattern); downstream
    # plans are the graded band-join shapes already audited on the
    # shipped table — and minhash_big_band_census additionally runs
    # two bounded count() control edges at build
    "dedup_minhash_recall_big",
    "minhash_big_band_census",
    "dedup_simhash_recall_big",
    # winnow + semantic call _big_documents_dir at build time too —
    # omitting them here would fire the 50k-doc parquet write while
    # "lazily" building their plans on a fresh machine (ADVICE r7 #1)
    "dedup_winnow_recall_big",
    "dedup_semantic_recall_big",
    # the round-9 multiprobe cost census shares the generated drop +
    # embedding memo build, plus a bounded distinct-doc count() edge
    "sem_big_band_census",
    # writes the silver table before the (lazily-planned) read; the
    # read plan is what the audit wants, so keep it out of the skip
    # set — but note the write job runs at build time
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from cassandra_log_analyzer_mcp_spark.plans import registry
    from cassandra_log_analyzer_mcp_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    hdr = f"{'query':<28} {'xchg':>4} {'bhj':>3} {'smj':>3} {'win':>3} {'wsc':>3}  scan"
    print(hdr)
    print("-" * len(hdr))
    for name, fn in registry.queries().items():
        if name in EAGER:
            print(f"{name:<28}    -   -   -   -   -  (executes eagerly)")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"{name:<28}  plan error: {e}")
            continue
        xchg = plan.count("Arguments: hashpartitioning") + plan.count(
            "Arguments: SinglePartition"
        )
        bhj = plan.count(") BroadcastHashJoin")
        smj = plan.count(") SortMergeJoin")
        win = plan.count(") Window")
        # distinct codegen stages (Spark 4 formatted mode annotates
        # participating nodes with "[codegen id : N]")
        import re

        wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        pushed = "pushdown" if "PushedFilters: [IsNotNull" in plan or (
            "PushedFilters: [" in plan and "PushedFilters: []" not in plan
        ) else ("pruned" if "ReadSchema" in plan else "cached/none")
        print(f"{name:<28} {xchg:>4} {bhj:>3} {smj:>3} {win:>3} {wsc:>3}  {pushed}")


if __name__ == "__main__":
    main()
