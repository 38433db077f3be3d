#!/usr/bin/env python3
"""STRONG-SCALING probe (round 7): same data, same queries, varying
worker count — the axis the three-SF sweep (SCALING.md) doesn't
measure. At 100 TB the question is "do 1000 executors go ~1000× as
fast as one", and local-mode's proxy is thread-count scaling: run a
representative per-family query slate at sf0.1 on local[4/8/16/32]
and record per-width wall totals + parallel efficiency.

Each width runs in its OWN subprocess (a SparkSession's master is
fixed for the JVM's life; re-running in-process would measure a warm
cache, not a fresh width). Within a width: one warm pass at sf0.001
(codegen/footers — same discipline as bench.py), shared layers
pre-built untimed, then each query timed to a noop sink.

Usage:
  python tools/scaling_workers.py [sf_dir] [--json PATH]    # orchestrate
  python tools/scaling_workers.py --width N [sf_dir]        # one width
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTHS = [4, 8, 16, 32]

#: one representative per plan family (scan+agg, broadcast join,
#: fact-fact join, window, sessionization, banded dedup, char-level
#: verify, brute ANN, trained IVF, positional grams, inverted index,
#: cube, text fold, streaming micro-batch)
SLATE = [
    "pricing_summary",
    "regional_revenue",
    "shipping_priority",
    "error_bursts",
    "user_sessions",
    "dedup_minhash_lsh",
    "dedup_editdist_dl",
    "knn_cosine_brute",
    "ann_ivf_kmeans",
    "repeated_spans_multik",
    "bm25_search",
    "revenue_cube",
    "doc_surprisal",
    "streaming_issue_counts",
]


def run_width(width: int, sf_dir: str) -> None:
    from cassandra_log_analyzer_mcp_spark.plans import registry
    from cassandra_log_analyzer_mcp_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-w{width}",
        master=f"local[{width}]",
        shuffle_partitions=width,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in SLATE:
            try:
                noop(qs[name](spark, warm_dir))
            except Exception:
                pass
    # shared layers untimed (the bench accounting): parsed silver,
    # shingle arrays, streamed-silver landing, trained k-means state
    from cassandra_log_analyzer_mcp_spark.operators.dedup import (
        _doc_shingle_arrays,
    )
    from cassandra_log_analyzer_mcp_spark.operators.similarity import (
        kmeans_centroid_state,
    )
    from cassandra_log_analyzer_mcp_spark.sources.tables import logs_flagged
    from cassandra_log_analyzer_mcp_spark.streaming.batch_bridge import (
        _landed_silver_dir,
    )

    noop(logs_flagged(spark, sf_dir))
    noop(_doc_shingle_arrays(spark, sf_dir))
    _landed_silver_dir(spark, sf_dir)
    kmeans_centroid_state(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in SLATE:
        t0 = time.perf_counter()
        try:
            noop(qs[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # recorded, not fatal
            timings[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
    print(json.dumps({"width": width, "timings": timings}))


def orchestrate(sf_dir: str, json_path: str | None) -> int:
    per_width: dict[str, dict] = {}
    for w in WIDTHS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--width", str(w), sf_dir],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except Exception:
            print(f"width {w} failed: {out.stderr[-500:]}", file=sys.stderr)
            return 1
        t = rec["timings"]
        total = round(sum(v for v in t.values() if v >= 0), 3)
        per_width[str(w)] = {"total_s": total, "queries": t}
        print(f"local[{w:>2}]: {total:.1f}s")
    base_w = WIDTHS[0]
    base = per_width[str(base_w)]["total_s"]
    for w in WIDTHS:
        tot = per_width[str(w)]["total_s"]
        speedup = round(base / tot, 3) if tot > 0 else None
        # parallel efficiency vs the base width (fixed per-query job
        # scheduling cost is NOT removed — this is the honest number)
        eff = round(speedup / (w / base_w), 3) if speedup else None
        per_width[str(w)]["speedup_vs_w4"] = speedup
        per_width[str(w)]["efficiency_vs_w4"] = eff
    result = {
        "sf_dir": sf_dir,
        "protocol": (
            "one subprocess per width (fresh JVM, fresh caches); warm "
            "pass at sf0.001; shared layers (silver, shingles, "
            "streamed landing, k-means state) pre-built untimed; "
            f"{len(SLATE)}-query per-family slate timed to noop sink; "
            "efficiency = (t_w4/t_w)/(w/4) — fixed ~1s/query job "
            "scheduling floor included, so the figure UNDERSTATES "
            "plan scalability at this toy data size"
        ),
        "slate": SLATE,
        "widths": per_width,
    }
    payload = json.dumps(result, indent=1, sort_keys=False)
    if json_path:
        with open(json_path, "w") as fh:
            fh.write(payload + "\n")
    print(payload)
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if "--width" in argv:
        i = argv.index("--width")
        width = int(argv[i + 1])
        rest = argv[:i] + argv[i + 2 :]
        sf_dir = rest[0] if rest else "/root/testdata/sf0.1"
        run_width(width, sf_dir)
        return 0
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    return orchestrate(sf_dir, json_path)


if __name__ == "__main__":
    raise SystemExit(main())
