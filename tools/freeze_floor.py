"""Freeze a round's floor epoch for newly registered lanes.

Floor epochs (``BENCH_FLOOR_r{N}.json``) are NEVER regenerated — each
round that adds queries freezes THEIR sf0.1 walls once, as medians over
n=3 quiet bench runs, and every later bench compares against all epochs
(the anti-creep gate in bench.py). Round 12 produced its epoch by hand;
this tool makes the procedure reproducible:

    python tools/freeze_floor.py --round 13 quality_classifier_score \\
        batch_contamination_diff source_dedup_trend

Runs ``bench.py`` three times at $SPARK_GRAFT_SF_DIR (default sf0.1),
medians the named queries (and any named approx lanes), and writes the
epoch file. Refuses to overwrite an existing epoch — floors are frozen.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    out_path = os.path.join(REPO, f"BENCH_FLOOR_r{args.round}.json")
    if os.path.exists(out_path):
        raise SystemExit(f"{out_path} exists — floor epochs are frozen")

    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    totals: list[float] = []
    q_samples: dict[str, list[float]] = {}
    a_samples: dict[str, list[float]] = {}
    for i in range(args.runs):
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            capture_output=True,
            text=True,
            check=True,
        )
        summary = json.loads(res.stdout.strip().splitlines()[-1])
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            detail = json.load(f)
        totals.append(summary["value"])
        for name in args.names:
            if name in detail["queries"]:
                q_samples.setdefault(name, []).append(detail["queries"][name])
            elif name in detail.get("approx", {}):
                a_samples.setdefault(name, []).append(detail["approx"][name])
            else:
                raise SystemExit(f"{name} absent from bench detail (run {i})")
        print(
            f"run {i + 1}/{args.runs}: total {summary['value']}s",
            file=sys.stderr,
        )

    sf = summary.get("sf")
    epoch = {
        "sf": sf,
        "frozen_at_round": args.round,
        "note": (
            f"Round-{args.round} floor epoch: the round's registry "
            f"additions frozen as medians over n={args.runs} quiet bench "
            f"runs on the final tree (totals "
            f"{'/'.join(str(round(t, 1)) for t in totals)} s). NEVER "
            "regenerate; later rounds' bench flags >2x AND >0.5 s vs "
            "these (tools/freeze_floor.py)."
        ),
        "queries": {
            n: round(statistics.median(v), 4) for n, v in q_samples.items()
        },
        "approx": {
            n: round(statistics.median(v), 4) for n, v in a_samples.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(epoch, f, indent=1, sort_keys=True)
    print(json.dumps({"frozen": sorted(args.names), "totals": totals}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
