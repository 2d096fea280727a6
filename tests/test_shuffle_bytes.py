"""Gate SHUFFLE_BYTES.json — the committed per-query network-cost snapshot
(VERDICT r12 item 2).

Two layers:

- shape (fast, pure JSON): every pinned lane and sketch pair is present
  with positive measurements, and the sketch lanes carry the directional
  claim the artifact exists to hold (sketch shuffle ≪ exact shuffle for
  the overlap lane; near-flat absolute bytes).
- regression (``slow`` marker): re-measure every pinned lane at the
  artifact's sf with the same REST stage-delta method and fail when a
  lane's shuffle write grew past the tolerance band. This catches the
  class wall-time at sf0.1 hides: an unpersisted intermediate re-inlined
  per consumer, or a lost broadcast turning a dim join into a corpus
  exchange — bytes double long before local wall moves.

Tolerance: measured ≤ 2×committed + 1 MB. Shuffle bytes for a fixed plan
are near-deterministic (compressed row batches; AQE coalescing moves
partition COUNT, not volume) — observed run-to-run jitter is <5%, so 2×
is generous headroom that still fails on any double-scan regression.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    with open(os.path.join(REPO, "SHUFFLE_BYTES.json")) as f:
        return json.load(f)


def _tool():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "shuffle_bytes_tool", os.path.join(REPO, "tools", "shuffle_bytes.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_artifact_covers_every_pinned_lane():
    tool = _tool()
    report = _load()
    assert set(report["lanes"]) == set(tool.LANES)
    assert len(tool.LANES) >= 50  # VERDICT r13 item 5: 20 → ≥50 lanes
    assert report.get("action") == "noop"  # full execution (r14 migration)
    assert set(report["sketch_pairs"]) == set(tool.SKETCH_PAIRS)
    for name, entry in report["lanes"].items():
        assert entry["shuffle_write_mb"] >= 0, name
        assert entry["wall_sec"] > 0, name


def test_artifact_covers_the_full_frozen_registry():
    """Round 14 extended coverage past the top-50: lanes + tail_lanes
    together must measure every registered query — shuffle bytes are the
    one per-lane scale metric immune to this host's wall drift, so the
    whole registry carries one."""
    from kafkastreamingetl_spark.queries import QUERIES

    report = _load()
    covered = set(report["lanes"]) | set(report.get("tail_lanes", {}))
    missing = set(QUERIES) - covered
    assert not missing, sorted(missing)
    for name, entry in report.get("tail_lanes", {}).items():
        assert entry["shuffle_write_mb"] >= 0, name
        assert entry["wall_sec"] > 0, name


def test_sketch_lanes_hold_their_shuffle_claim():
    """The overlap sketch's whole reason to exist: fixed k×|sources|
    MinHash state crossing the wire instead of the distinct shingle
    vocabulary. If the sketch lane ever shuffles megabytes, the lane is
    broken regardless of what the oracle says about its values."""
    report = _load()
    pairs = report["sketch_pairs"]
    ov = pairs["source_overlap_minhash"]
    assert ov["sketch"]["shuffle_write_mb"] < 0.1
    assert ov["exact"]["shuffle_write_mb"] > 10 * max(
        ov["sketch"]["shuffle_write_mb"], 0.001
    )
    rfm = pairs["user_rfm_segments_approx"]
    # the sketch kills the exact lane's global range exchange (ntile):
    # its shuffle must not EXCEED the exact lane's
    assert (
        rfm["sketch"]["shuffle_write_mb"]
        <= rfm["exact"]["shuffle_write_mb"] + 0.05
    )


@pytest.mark.slow
def test_no_lane_regressed_past_the_shuffle_band(spark):
    tool = _tool()
    report = _load()
    sf_dir = report["sf_dir"]
    if not os.path.isdir(sf_dir):
        pytest.skip(f"artifact sf dir {sf_dir} not present")
    measured = tool.measure(spark, sf_dir)
    committed_all = {**report.get("tail_lanes", {}), **report["lanes"]}
    bad = {}
    for name, committed in committed_all.items():
        got = measured[name]["shuffle_write_mb"]
        limit = 2.0 * committed["shuffle_write_mb"] + 1.0
        if got > limit:
            bad[name] = (got, committed["shuffle_write_mb"])
    assert not bad, f"shuffle-write regressions (measured, committed): {bad}"
