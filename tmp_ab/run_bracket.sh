#!/bin/bash
set -e
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
run_leg () {  # $1 repo dir, $2 leg name
  cd "$1"
  echo "=== leg $2 start $(date +%T) ==="
  python bench.py > /root/repo/tmp_ab/$2.stdout 2>/root/repo/tmp_ab/$2.stderr || echo "leg $2 FAILED"
  cp "$1/BENCH_FULL.json" /root/repo/tmp_ab/$2.json
  echo "=== leg $2 done $(date +%T) ==="
}
run_leg /tmp/r8tip A1
run_leg /root/repo B1
run_leg /tmp/r8tip A2
run_leg /root/repo B2
for l in A1 B1 A2 B2; do
  python3 -c "import json; d=json.load(open('/root/repo/tmp_ab/$l.json')); print('$l', d['value'], d['n_queries'])"
done
