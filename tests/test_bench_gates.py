"""bench.py's two regression gates, unit-level (no Spark session):

* the per-round floor refresh (`_regression_report`) proves no regression
  vs LAST round;
* the frozen round-10 headline floor (`_frozen_floor_report`,
  BENCH_FLOOR_r10.json — never regenerated) catches the multi-round creep
  the per-round gate is structurally blind to (VERDICT r10 item 4).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _floors() -> dict[str, float]:
    with open(os.path.join(REPO, "BENCH_FLOOR_r10.json")) as f:
        return json.load(f)["queries"]


def test_frozen_floor_file_is_the_committed_r10_headline_set():
    with open(os.path.join(REPO, "BENCH_FLOOR_r10.json")) as f:
        frozen = json.load(f)
    assert frozen["frozen_at_round"] == 10 and frozen["sf"] == 0.1
    heads = {
        l.split("## ")[1].strip()
        for l in open(os.path.join(REPO, "PLANS.md"))
        if l.startswith("## ")
    }
    # every PLANS.md headline is gated; a new headline chapter without a
    # floor entry fails here so the gate can't silently shrink
    assert heads <= set(frozen["queries"]), heads - set(frozen["queries"])


def test_frozen_floor_flags_creep_and_reports_ratio():
    floors = _floors()
    timings = dict(floors)
    timings["hot_ngrams"] = floors["hot_ngrams"] * 3  # > 2x and > 0.5 s
    rep = bench._frozen_floor_report(timings, 0.1)
    assert rep["frozen_floor_round"] == 10
    assert list(rep["frozen_regressions"]) == ["hot_ngrams"]
    assert rep["frozen_headline_ratio"] > 1.0


def test_frozen_floor_quiet_at_floor_and_ignores_other_sf():
    floors = _floors()
    rep = bench._frozen_floor_report(dict(floors), 0.1)
    assert rep["frozen_regressions"] == {}
    assert abs(rep["frozen_headline_ratio"] - 1.0) < 1e-9
    # a sub-second 2x that moves < 0.5 s absolute is timer noise, not creep
    timings = dict(floors)
    timings["campaign_attribution_scd2"] = floors["campaign_attribution_scd2"] + 0.4
    assert bench._frozen_floor_report(timings, 0.1)["frozen_regressions"] == {}
    # floors are sf0.1 walls; any other sf must not compare against them
    assert bench._frozen_floor_report(dict(floors), 0.01) == {}
