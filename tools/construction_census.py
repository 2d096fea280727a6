"""Per-lane query-CONSTRUCTION cost census (driver-side, no jobs).

For every registered lane, times ``queries()[name](spark, sf_dir)`` —
the Python/py4j DataFrame construction — cold (first call) and warm
(second call, catalog/probe memos hot), plus the physical-planning cost
(``_jdf.queryExecution().executedPlan()``) of the warm handle. This is
the measurement that drove the r15 driver-cost work (OPTIMIZATION_r15:
63.4 s warm construction across 179 lanes before the fixes) — construction
is inside the bench's timed region, so it is real headline weight even
though no job runs.

Usage: python tools/construction_census.py [--top 20] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamingetl_spark.session import get_test_spark  # noqa: E402
from __spark_entry__ import queries  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None)
    ap.add_argument("--lanes", nargs="*", default=None)
    args = ap.parse_args()

    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_test_spark("construction_census")
    qs = queries()
    if args.lanes:
        qs = {n: qs[n] for n in args.lanes}

    rows: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        plan = time.perf_counter() - t0
        rows[name] = {
            "cold": round(cold, 4),
            "warm": round(warm, 4),
            "plan": round(plan, 4),
        }

    ok = {n: r for n, r in rows.items() if "error" not in r}
    tot = {
        k: round(sum(r[k] for r in ok.values()), 2)
        for k in ("cold", "warm", "plan")
    }
    print(f"totals over {len(ok)} lanes: {tot}", file=sys.stderr)
    for n, r in sorted(
        ok.items(), key=lambda kv: kv[1]["warm"] + kv[1]["plan"], reverse=True
    )[: args.top]:
        print(
            f"{n:40s} cold={r['cold']:7.3f} warm={r['warm']:7.3f} "
            f"plan={r['plan']:7.3f}",
            file=sys.stderr,
        )
    out = {"sf_dir": sf_dir, "totals": tot, "lanes": rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"totals": tot, "n": len(ok)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
