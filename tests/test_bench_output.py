"""bench.py stdout contract: the driver records only a 2000-byte TAIL
of stdout (BENCH_r01.json: ``tail`` is exactly 2000 bytes, ``parsed``
null — the full per-query dict was ~3.3 KB, so the line's head fell
outside the capture window). The emitted line must always fit the
window and still parse, regardless of how many queries the registry
grows to.

No Spark needed — the payload builder is pure.
"""

from __future__ import annotations

import json
import random

import bench
from cassandra_log_analyzer_mcp_spark.plans import registry


def _line(payload: dict) -> str:
    return json.dumps(payload, separators=(",", ":")) + "\n"


def test_real_registry_names_fit_capture_window() -> None:
    rng = random.Random(7)
    timings = {
        name: round(rng.uniform(0.1, 7.0), 3) for name in registry.queries()
    }
    out = bench.build_stdout_payload(timings, 0.1)
    line = _line(out)
    # the pinned contract (VERDICT r7 hygiene #2): the line fits the
    # 2000-byte capture with ≥150 bytes of tail headroom to spare
    assert bench.CAPTURE_WINDOW_BYTES - bench.STDOUT_BYTE_BUDGET >= 150
    assert len(line) <= bench.STDOUT_BYTE_BUDGET
    parsed = json.loads(line)
    assert parsed["n_queries"] == len(timings)
    assert parsed["value"] == round(sum(timings.values()), 3)
    assert parsed["unit"] == "sec"
    # the slowest query is always reported by name
    slowest = max(timings, key=timings.__getitem__)
    assert parsed["queries"][slowest] == timings[slowest]
    # kept entries are exactly the top-k slowest (no cherry-picking)
    floor = min(parsed["queries"].values())
    dropped_faster = [
        t for n, t in timings.items() if n not in parsed["queries"]
    ]
    assert all(t <= floor for t in dropped_faster)


def test_quiet_log4j_profile_wired(spark) -> None:
    """The session builder must point the driver JVM at the packaged
    quiet log4j2 profile — the at-source fix for the NativeCodeLoader
    notice that kept preceding bench's JSON line in the driver's
    combined-stream tail capture."""
    import os

    opts = spark.conf.get("spark.driver.extraJavaOptions", "")
    assert "log4j2-quiet.properties" in opts
    path = opts.split("log4j2.configurationFile=file:", 1)[1]
    assert os.path.exists(path)


def test_small_surface_is_untrimmed() -> None:
    timings = {"q1": 1.0, "q2": 2.0}
    out = bench.build_stdout_payload(timings, 0.01)
    assert out["queries"] == timings


def test_pathologically_long_names_never_overflow() -> None:
    timings = {f"{'x' * 120}_{i}": float(i) for i in range(200)}
    out = bench.build_stdout_payload(timings, "custom")
    assert len(_line(out)) <= bench.STDOUT_BYTE_BUDGET
    # negative (errored) timings never inflate the headline value
    timings["broken"] = -1.0
    out = bench.build_stdout_payload(timings, "custom")
    assert out["value"] == round(sum(range(200)), 3)
