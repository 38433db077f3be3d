#!/bin/bash
set -e
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_QUERIES="dedup_semantic_recall_big,streaming_rack_counts,repeated_span_coverage,error_seasonal_mad,log_parse_csv,dedup_cross_source_matrix"
run () { cd "$1"; python bench.py >/dev/null 2>&1; cp "$1/BENCH_FULL.json" /root/repo/tmp_ab/rp_$2.json; echo "done $2 $(date +%T)"; }
run /tmp/r8tip  rpA1
run /root/repo  rpB1
run /root/repo  rpB2
run /tmp/r8tip  rpA2
