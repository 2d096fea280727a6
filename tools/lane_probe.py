"""Targeted per-lane probe: median-of-N noop-sink walls for named lanes.

Usage: python tools/lane_probe.py [-n 3] [--sf-dir DIR] lane1 lane2 ...
Prints one JSON line: {"lane": {"median": s, "samples": [...]}}.

Methodology matches bench.py (the driver's bench): warm each lane once at
sf0.001 (JIT), clearCache between samples, noop-sink action, fitted-model
memos prewarmed so samples are serving-only. This exists because the host
shows transient multi-second stalls (documented host-day drift, VERDICT
r13/r14): single-run walls cannot adjudicate a per-lane before/after —
medians of interleaved samples can.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamingetl_spark.session import get_test_spark  # noqa: E402
from __spark_entry__ import queries  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lanes: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]; i += 2
        else:
            lanes.append(args[i]); i += 1

    spark = get_test_spark("lane_probe")
    qs = queries()
    missing = [x for x in lanes if x not in qs]
    if missing:
        raise SystemExit(f"unknown lanes: {missing}")

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm: JIT + fitted-model memos (one pass at the smallest sf, then one
    # at the probe sf so any model memo keyed on the probe input is hot).
    warm = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    for name in lanes:
        spark.catalog.clearCache()
        qs[name](spark, warm).write.format("noop").mode("overwrite").save()
        run(name)

    # Interleave samples round-robin so a transient host stall cannot sink
    # every sample of one lane.
    samples: dict[str, list[float]] = {name: [] for name in lanes}
    for _ in range(n):
        for name in lanes:
            samples[name].append(round(run(name), 4))

    import statistics

    out = {}
    for name, ss in samples.items():
        # true median (even n averages the middle pair — matches
        # bench_median.py's methodology; ADVICE r15)
        out[name] = {"median": round(statistics.median(ss), 4), "samples": ss}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
