"""Gate the committed scale-evidence artifacts (VERDICT r12 item 1).

Round 12's refresh of ``SCALE_STRESS.json`` silently dropped the ``x100``
scale block while ``SCALE.md`` kept citing ×100 numbers — the repo's
strongest scale claim became prose, not a machine-checked artifact. These
tests are pure-JSON (no Spark session): they pin the artifact's SHAPE so a
future regeneration that loses a scale, a stressed query, or a sketch lane
fails the suite instead of passing silently.

The artifact is produced by ``SCALES=10,50,100 python tools/scale_stress.py``.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED_SCALES = ("x1", "x10", "x50", "x100")

# The three sketch lanes whose reason to exist is scale (VERDICT r11 item
# 6): each must be measured NEXT TO its exact twin at every stress point.
SKETCH_LANES = {
    "source_overlap_minhash": "source_overlap_matrix",
    "user_rfm_segments_approx": "user_rfm_segments",
    "lm_bucket_mix_approx": "lm_score_bucket_mix",
}


def _load():
    with open(os.path.join(REPO, "SCALE_STRESS.json")) as f:
        return json.load(f)


def test_all_scales_present_including_x100():
    report = _load()
    assert set(REQUIRED_SCALES) <= set(report["scales"]), sorted(
        report["scales"]
    )


def test_artifact_measured_under_the_full_execution_action():
    """r14 migration: the committed scale walls must be full-execution
    (noop action) — a count-measured regeneration would silently restore
    the 1.2–2.4× window-lane under-measure."""
    assert _load().get("action") == "noop"


def test_every_stressed_query_sublinear_at_every_scale():
    report = _load()
    base = set(report["scales"]["x1"]["wall_sec"])
    assert len(base) >= 25  # the full stressed set, not a sampled rerun
    for scale in REQUIRED_SCALES[1:]:
        block = report["scales"][scale]
        # same query set at every scale — a dropped query is a lost claim
        assert set(block["wall_sec"]) == base, scale
        assert set(block["ratio_vs_x1"]) == base, scale
        bad = {n: v for n, v in block["sublinear"].items() if v is not True}
        assert not bad, (scale, bad)
    assert report["violations"] == []


def test_fit_and_prewarm_held_to_the_same_bound():
    """The first ×50 run's superlinear cluster-closure build slipped past
    an assertion that only covered serving walls — fit/prewarm ratios must
    be recorded and bounded at every scale."""
    report = _load()
    for scale, k in (("x10", 10), ("x50", 50), ("x100", 100)):
        block = report["scales"][scale]
        ratios = block["fit_ratio_vs_x1"]
        assert ratios, scale
        bad = {n: r for n, r in ratios.items() if r >= k}
        assert not bad, (scale, bad)


def test_lang_fanout_fixture_measured_both_lanes():
    """VERDICT r12 item 3: the CCNet bucket sketch's lever is language
    cardinality, which replication cannot grow — the ~100-language
    relabel fixture must carry BOTH lanes at ×1 and the largest stress
    scale so the crossover claim (or its honest refutation) is an
    artifact, not prose."""
    report = _load()
    fanout = report["lang_fanout"]
    assert set(fanout) == {"x1", "x100"}
    for blk in fanout.values():
        assert blk["n_langs"] >= 100
        assert blk["exact_sec"] > 0 and blk["sketch_sec"] > 0
        assert blk["quality_percentile_filter_sec"] > 0
        assert "speedup" in blk


def test_sketch_lanes_measured_next_to_exact_twin_at_every_scale():
    report = _load()
    for scale in REQUIRED_SCALES:
        lanes = report["scales"][scale]["sketch_lanes"]
        assert set(lanes) == set(SKETCH_LANES), scale
        for name, entry in lanes.items():
            assert entry["exact_twin"] == SKETCH_LANES[name]
            assert entry["sketch_sec"] > 0 and entry["exact_sec"] > 0


def test_window_skew_probe_shows_the_single_reducer_cliff():
    """WINDOW_SKEW.json (tools/window_skew_probe.py): on a single-language
    corpus the exact CCNet cut's rank window funnels its WHOLE cut table
    through one task — linear in corpus size, the 100 TB cliff — while
    the sketch lane's only funnel is the approx_percentile partial
    merge, bounded by construction at accuracy × shuffle partitions.
    The x10→x100 growth contrast is the machine-checked claim behind
    keeping the wall-losing sketch lane (SCALE.md round-13
    adjudication)."""
    with open(os.path.join(REPO, "WINDOW_SKEW.json")) as f:
        report = json.load(f)
    scales = report["scales"]

    def max_funnel(scale, lane):
        funnels = scales[scale][f"{lane}_funnels"]
        assert funnels, (scale, lane)
        for fnl in funnels:
            assert fnl["n_tasks"] == 1 or (
                fnl["max_task_read_mb"] / fnl["total_read_mb"] > 0.9
            )
        return max(f["max_task_read_mb"] for f in funnels)

    e10, e100 = max_funnel("x10", "exact"), max_funnel("x100", "exact")
    s10, s100 = max_funnel("x10", "sketch"), max_funnel("x100", "sketch")
    # exact: the funnel is the whole cut table — tracks corpus size
    assert e100 / e10 > 5, (e10, e100)
    # sketch: bounded by accuracy x partitions (10k entries x 32 partials)
    assert s100 < 3.5, s100
    # and at the big scale the exact funnel carries >2x the sketch's
    assert e100 > 2 * s100, (e100, s100)
