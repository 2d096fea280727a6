"""Freeze a round's floor epoch for newly registered lanes.

Floor epochs (``BENCH_FLOOR_r{N}.json``) are NEVER regenerated — each
round that adds queries freezes THEIR sf0.1 walls once, as medians over
n=3 quiet bench runs, and every later bench compares against all epochs
OF THE SAME ACTION (the anti-creep gate in bench.py; epochs are
action-aware since the round-14 count→noop migration). Round 12 produced
its epoch by hand; this tool makes the procedure reproducible:

    python tools/freeze_floor.py --round 13 quality_classifier_score \\
        batch_contamination_diff source_dedup_trend

    # round-14 migration epoch: the FULL registry under the new noop
    # action, plus a same-tree single-run count bridge so the r10–r13
    # count numbers stay interpretable lane-by-lane:
    python tools/freeze_floor.py --round 14 --all --bridge-action count

Runs ``bench.py`` N times at $SPARK_GRAFT_SF_DIR (default sf0.1),
medians the named queries (and any named approx lanes), and writes the
epoch file stamped with the action it was measured under. Refuses to
overwrite an existing epoch — floors are frozen. Each bench subprocess
writes its detail to a SCRATCH path (SPARK_GRAFT_BENCH_DETAIL) so
freezing a floor never dirties the committed BENCH_DETAIL.json
(ADVICE r13: the old behavior left the last single run's detail in the
working tree, easy to commit as a stale artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(sf_dir: str, action: str, scratch: str) -> dict:
    """One bench.py subprocess under the given action; returns the detail
    map read from the scratch path (the committed BENCH_DETAIL.json is
    never touched)."""
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env={
            **os.environ,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_BENCH_ACTION": action,
            "SPARK_GRAFT_BENCH_DETAIL": scratch,
        },
        capture_output=True,
        text=True,
        check=True,
    )
    json.loads(res.stdout.strip().splitlines()[-1])  # summary parses
    with open(scratch) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--all",
        action="store_true",
        help="freeze every registered query and every approx lane",
    )
    ap.add_argument(
        "--bridge-action",
        choices=["count", "noop"],
        help=(
            "also run the bench ONCE under this other action on the same "
            "tree and record its per-lane walls as a bridge block — the "
            "r14 migration's count↔noop link"
        ),
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if not args.all and not args.names:
        raise SystemExit("name at least one lane, or pass --all")

    out_path = os.path.join(REPO, f"BENCH_FLOOR_r{args.round}.json")
    if os.path.exists(out_path):
        raise SystemExit(f"{out_path} exists — floor epochs are frozen")

    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    action = os.getenv("SPARK_GRAFT_BENCH_ACTION", "noop")
    totals: list[float] = []
    q_samples: dict[str, list[float]] = {}
    a_samples: dict[str, list[float]] = {}
    scratch_dir = tempfile.mkdtemp(prefix="freeze_floor_")
    detail = None
    for i in range(args.runs):
        scratch = os.path.join(scratch_dir, f"detail_{i}.json")
        detail = _run_bench(sf_dir, action, scratch)
        totals.append(detail["value"])
        names = (
            sorted(set(detail["queries"]) | set(detail.get("approx", {})))
            if args.all
            else args.names
        )
        for name in names:
            if name in detail["queries"]:
                q_samples.setdefault(name, []).append(detail["queries"][name])
            elif name in detail.get("approx", {}):
                a_samples.setdefault(name, []).append(
                    detail["approx"][name]["sec"]
                )
            else:
                raise SystemExit(f"{name} absent from bench detail (run {i})")
        print(
            f"run {i + 1}/{args.runs}: total {detail['value']}s ({action})",
            file=sys.stderr,
        )

    sf = detail.get("sf")
    epoch = {
        "sf": sf,
        "action": action,
        "frozen_at_round": args.round,
        "note": (
            f"Round-{args.round} floor epoch under the {action!r} bench "
            f"action: {'the FULL registry' if args.all else 'the round'}"
            f"{'' if args.all else ' additions'} frozen as medians over "
            f"n={args.runs} quiet bench runs on the final tree (totals "
            f"{'/'.join(str(round(t, 1)) for t in totals)} s). NEVER "
            "regenerate; later rounds' bench flags >2x AND >0.5 s vs "
            "these, same-action runs only (tools/freeze_floor.py)."
        ),
        "queries": {
            n: round(statistics.median(v), 4) for n, v in q_samples.items()
        },
        "approx": {
            n: round(statistics.median(v), 4) for n, v in a_samples.items()
        },
    }

    if args.bridge_action and args.bridge_action != action:
        scratch = os.path.join(scratch_dir, "bridge.json")
        bridge = _run_bench(sf_dir, args.bridge_action, scratch)
        epoch["bridge"] = {
            "action": args.bridge_action,
            "note": (
                "Single same-tree run under the OTHER action, linking this "
                "epoch to the pre-r14 count-measured history lane-by-lane "
                "(the count/noop ratio per window lane IS the measured "
                "count-action pruning bias)."
            ),
            "total": bridge["value"],
            "queries": bridge["queries"],
            "approx": {
                n: d["sec"] for n, d in bridge.get("approx", {}).items()
            },
        }
        print(
            f"bridge ({args.bridge_action}): total {bridge['value']}s",
            file=sys.stderr,
        )

    with open(out_path, "w") as f:
        json.dump(epoch, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "frozen": len(epoch["queries"]) + len(epoch["approx"]),
                "action": action,
                "totals": totals,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
