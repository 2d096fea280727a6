"""The bench's frozen-floor anti-creep gate: multi-epoch floor files
(BENCH_FLOOR_r*.json), approx-lane coverage, and the flag rule. Pure
function tests — no Spark session."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REPO)
    spec.loader.exec_module(mod)
    return mod


def _write_floor(
    tmp_path, rnd, queries=None, approx=None, sf=0.1, action="noop"
):
    payload = {"frozen_at_round": rnd, "sf": sf, "queries": queries or {}}
    if action is not None:  # None = simulate a pre-r14 file with no key
        payload["action"] = action
    if approx is not None:
        payload["approx"] = approx
    with open(tmp_path / f"BENCH_FLOOR_r{rnd}.json", "w") as f:
        json.dump(payload, f)


def test_multi_epoch_floors_merge_and_headline_pins_oldest(tmp_path, monkeypatch):
    bench = _bench_module()
    monkeypatch.setattr(
        os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    _write_floor(tmp_path, 10, queries={"q_old": 1.0, "q_shared": 2.0})
    _write_floor(tmp_path, 11, queries={"q_new": 1.0}, approx={"a_sketch": 0.5})
    timings = {"q_old": 1.1, "q_shared": 1.9, "q_new": 3.0}  # q_new: >2x, >0.5s
    approx = {"a_sketch": 2.0}  # >2x and >0.5s over its 0.5 floor
    rep = bench._frozen_floor_report(timings, 0.1, approx)
    assert rep["frozen_floor_rounds"] == [10, 11]
    # headline ratio pins to the OLDEST epoch (longest lever): r10 only
    assert rep["frozen_floor_round"] == 10
    assert rep["frozen_headline_ratio"] == round((1.1 + 1.9) / 3.0, 4)
    # flags from BOTH epochs and BOTH lanes
    assert set(rep["frozen_regressions"]) == {"q_new", "a_sketch"}


def test_flag_rule_requires_ratio_and_absolute_slip(tmp_path, monkeypatch):
    bench = _bench_module()
    monkeypatch.setattr(
        os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    _write_floor(tmp_path, 10, queries={"fast": 0.1, "slow": 5.0})
    # fast: 3x ratio but only 0.2s absolute -> noise, not flagged;
    # slow: +4s absolute but <2x ratio -> not flagged
    rep = bench._frozen_floor_report({"fast": 0.3, "slow": 9.0}, 0.1, {})
    assert rep["frozen_regressions"] == {}


def test_sf_mismatch_and_missing_files_degrade_to_empty(tmp_path, monkeypatch):
    bench = _bench_module()
    monkeypatch.setattr(
        os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    assert bench._frozen_floor_report({"q": 1.0}, 0.1, {}) == {}
    _write_floor(tmp_path, 10, queries={"q": 1.0}, sf=0.01)
    assert bench._frozen_floor_report({"q": 9.0}, 0.1, {}) == {}
    assert bench._frozen_floor_report({"q": 9.0}, None, {}) == {}


def test_floor_epochs_are_action_aware(tmp_path, monkeypatch):
    """The r14 migration's bridge rule: a count-measured epoch must never
    gate a noop (full-execution) run — count-pruned window walls are
    1.2–2.4× lower, so cross-action comparison flags phantom regressions
    on every window lane. Files with NO action key are pre-r14 = count."""
    bench = _bench_module()
    monkeypatch.setattr(
        os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    _write_floor(tmp_path, 10, queries={"q": 1.0}, action=None)  # pre-r14
    _write_floor(tmp_path, 13, queries={"q": 1.1}, action="count")
    _write_floor(tmp_path, 14, queries={"q": 1.5}, action="noop")
    # noop run: only the r14 noop epoch participates
    rep = bench._frozen_floor_report({"q": 4.0}, 0.1, {}, "noop")
    assert rep["frozen_floor_rounds"] == [14]
    assert rep["frozen_floor_round"] == 14
    assert rep["frozen_headline_ratio"] == round(4.0 / 1.5, 4)
    # count run: the two count epochs participate, headline pins oldest
    rep = bench._frozen_floor_report({"q": 4.0}, 0.1, {}, "count")
    assert rep["frozen_floor_rounds"] == [10, 13]
    assert rep["frozen_floor_round"] == 10


def test_confirm_flags_requires_two_of_three_breaches():
    """VERDICT r13 item 2: single-run flag sets were disjoint across
    same-tree runs (all noise), so a flag is only recorded after the lane
    re-measures slow in >=2 of 3 samples; failed/None re-measures confirm
    nothing; the samples ride along on both branches."""
    bench = _bench_module()
    flags = {"a": {"now": 3.0, "frozen_floor": 1.0}}
    conf, prov, cerrs = bench._confirm_flags(
        flags, "frozen_floor", 0.5, lambda n: 2.9
    )
    assert set(conf) == {"a"} and conf["a"]["breaches"] == 3
    assert conf["a"]["samples"] == [3.0, 2.9, 2.9]
    assert cerrs == []
    # re-measures come back fast -> host hiccup, provisional only
    conf, prov, cerrs = bench._confirm_flags(
        flags, "frozen_floor", 0.5, lambda n: 1.05
    )
    assert conf == {} and set(prov) == {"a"} and prov["a"]["breaches"] == 1
    # re-measure unavailable (unknown lane) -> cannot confirm, NOT an error
    conf, prov, cerrs = bench._confirm_flags(
        flags, "frozen_floor", 0.5, lambda n: None
    )
    assert conf == {} and set(prov) == {"a"} and cerrs == []


def test_confirm_flags_counts_crashed_remeasures():
    """VERDICT r14 #3: a re-measure that CRASHES contributes no breach
    (it confirms nothing) but must not vanish — it is counted per attempt
    in the returned confirm_errors list, which bench.py emits as
    n_confirm_errors in the detail and summary, so a regression whose
    confirmation crashed is visible in the artifact, not silently
    unconfirmed."""
    bench = _bench_module()
    flags = {"a": {"now": 3.0, "frozen_floor": 1.0}}

    def _boom(name):
        raise RuntimeError("executor lost")

    conf, prov, cerrs = bench._confirm_flags(flags, "frozen_floor", 0.5, _boom)
    # only the single-run sample remains -> flag cannot confirm
    assert conf == {} and set(prov) == {"a"}
    assert prov["a"]["samples"] == [3.0]
    assert cerrs == ["a", "a"]  # both re-measure attempts crashed

    # mixed: first attempt crashes, second breaches -> 2 of 2 samples
    # breach, flag confirms, and the crash is still counted
    calls = {"n": 0}

    def _flaky(name):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return 2.9

    conf, prov, cerrs = bench._confirm_flags(
        flags, "frozen_floor", 0.5, _flaky
    )
    assert set(conf) == {"a"} and conf["a"]["samples"] == [3.0, 2.9]
    assert cerrs == ["a"]


def test_default_detail_path_is_untracked_scratch():
    """VERDICT r14 #1: the committed BENCH_DETAIL.json is written only by
    tools/bench_median.py; bench.py's default detail path is a gitignored
    scratch file, so a driver-initiated or ad-hoc run leaves the working
    tree clean and can never replace the committed median evidence."""
    bench = _bench_module()
    assert bench.DEFAULT_DETAIL_BASENAME != "BENCH_DETAIL.json"
    import subprocess

    res = subprocess.run(
        ["git", "check-ignore", "-q", bench.DEFAULT_DETAIL_BASENAME],
        cwd=REPO,
    )
    assert res.returncode == 0, (
        f"{bench.DEFAULT_DETAIL_BASENAME} must be gitignored"
    )


def test_median_evidence_matches_on_sf_and_action(tmp_path, monkeypatch):
    bench = _bench_module()
    monkeypatch.setattr(
        os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    assert bench._median_evidence(0.1, "noop") is None  # no file
    payload = {
        "sf": 0.1,
        "action": "noop",
        "headline_median": 150.0,
        "n": 3,
        "cross_tree": {"ratio": 1.1},
    }
    with open(tmp_path / "BENCH_MEDIAN.json", "w") as f:
        json.dump(payload, f)
    assert bench._median_evidence(0.1, "noop") == payload
    assert bench._median_evidence(0.01, "noop") is None
    assert bench._median_evidence(0.1, "count") is None


def test_regression_floors_prefer_median_over_single_run(
    tmp_path, monkeypatch
):
    """Round-over-round floors use the n>=3 per-query medians when a
    matching BENCH_MEDIAN.json exists — a committed detail rewritten in
    an unusually fast hour must not become next round's phantom-flag
    floor."""
    bench = _bench_module()
    monkeypatch.setattr(
        os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    with open(tmp_path / "BENCH_MEDIAN.json", "w") as f:
        json.dump(
            {
                "sf": 0.1,
                "action": "noop",
                "per_query_median": {"q": 2.0},
            },
            f,
        )
    with open(tmp_path / "BENCH_DETAIL.json", "w") as f:
        json.dump(
            {"sf": 0.1, "action": "noop", "queries": {"q": 0.9}}, f
        )
    # 3.2s: >2x and >1s over the 0.9 single-run floor, but NOT >2x the
    # 2.0 median floor -> median wins, no flag
    rep = bench._regression_report({"q": 3.2}, 0.1, "noop")
    assert rep["baseline_round"] == "committed-median"
    assert rep["regressions"] == {}
    # count-action run ignores the noop median AND the noop detail
    rep = bench._regression_report({"q": 3.2}, 0.1, "count")
    assert rep["baseline_round"] is None


def test_committed_r14_floor_epoch_full_registry_with_count_bridge():
    """The r14 migration epoch: full registry frozen under the noop
    action (n=3 medians) plus the same-tree count bridge that links it to
    the r10–r13 count history. The bridge must actually EVIDENCE the
    pruning bias the migration fixed — window lanes measurably cheaper
    under count."""
    with open(os.path.join(REPO, "BENCH_FLOOR_r14.json")) as f:
        floor = json.load(f)
    assert floor["frozen_at_round"] == 14 and floor["sf"] == 0.1
    assert floor["action"] == "noop"
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    assert set(floor["queries"]) == set(QUERIES)
    assert set(floor["approx"]) == set(APPROX_VARIANTS)
    bridge = floor["bridge"]
    assert bridge["action"] == "count"
    assert set(bridge["queries"]) == set(QUERIES)
    for lane in ("windowed_agg_sliding", "windowed_agg_tumbling"):
        assert floor["queries"][lane] > 2 * bridge["queries"][lane], lane


def test_committed_bench_median_evidence_is_current_and_merged():
    """BENCH_MEDIAN.json (tools/bench_median.py): n>=3 totals, a
    cross-tree control with a committed/measured ratio, and bench.py's
    merge of the evidence into the committed BENCH_DETAIL.json — the
    fields the drift gates read instead of a lone wall number."""
    with open(os.path.join(REPO, "BENCH_MEDIAN.json")) as f:
        med = json.load(f)
    assert med["n"] >= 3 and len(med["totals"]) == med["n"]
    assert med["action"] == "noop" and med["sf"] == 0.1
    assert med["headline_median"] > 0
    assert len(med["per_query_median"]) >= 179
    ct = med["cross_tree"]
    assert ct["ratio"] > 0 and ct["committed_total"] > 0 and ct["commit"]
    assert isinstance(med["confirmed_regressions"], dict)
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        det = json.load(f)
    assert det.get("action") == "noop"
    merged = det.get("median_evidence", {})
    assert merged.get("headline_median") == med["headline_median"]
    assert (merged.get("cross_tree") or {}).get("ratio") == ct["ratio"]
    # Since r15 the committed detail IS one of the median-evidence runs
    # (the median one — bench_median.py is its only writer), so a stray
    # single-run rewrite of the committed detail can no longer diverge
    # silently from the median evidence: this fails loudly instead.
    assert det["value"] in med["totals"]
    assert det["value"] == med["headline_median"]
    assert set(det["queries"]) == set(med["per_query_median"])


def test_committed_r11_floor_file_is_valid_and_covers_the_sketch_lanes():
    with open(os.path.join(REPO, "BENCH_FLOOR_r11.json")) as f:
        floor = json.load(f)
    assert floor["frozen_at_round"] == 11 and floor["sf"] == 0.1
    assert set(floor["approx"]) == {
        "source_overlap_minhash",
        "user_rfm_segments_approx",
    }
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS

    assert set(floor["approx"]) <= set(APPROX_VARIANTS)


def test_host_attribution_demotes_control_breaching_flags():
    """tools/bench_median.py (round 15): the n median runs share one
    machine-day, so a day-level systematic can confirm the same flag in
    >=2 runs — observed live in r15 when minhash/simhash/neardup lanes
    ran 2-3x slow across a whole bench_median session and at floor speed
    in isolated probes minutes later. The cross-tree control is
    byte-identical old code on the same day: if IT breaches the lane's
    frozen floor too (same 2x + 0.5 s rule), the flag is demoted to
    host_attributed with the control measurement attached."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_median_under_test", os.path.join(REPO, "tools", "bench_median.py")
    )
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    confirmed = {
        "lane_host": {"runs_flagged": 3, "of_runs": 3, "samples": [4.0, 4.2]},
        "lane_code": {"runs_flagged": 2, "of_runs": 3, "samples": [3.8, 3.9]},
    }
    flags_by_run = [
        {"lane_host": {"now": 4.0, "frozen_floor": 1.5},
         "lane_code": {"now": 3.8, "frozen_floor": 1.5}},
        {"lane_host": {"now": 4.2, "frozen_floor": 1.5}},
    ]
    # control: lane_host breaches (4.1 > 2*1.5, slip > 0.5) -> host;
    # lane_code at floor speed on old code -> stays confirmed (real)
    control = {"lane_host": 4.1, "lane_code": 1.6}
    still, host = bm.demote_host_attributed(confirmed, flags_by_run, control)
    assert set(still) == {"lane_code"}
    assert set(host) == {"lane_host"}
    assert host["lane_host"]["control_now"] == 4.1
    assert host["lane_host"]["frozen_floor"] == 1.5
    assert host["lane_host"]["samples"] == [4.0, 4.2]  # evidence retained

    # missing control measurement (lane errored there) -> cannot
    # attribute to host, flag stays confirmed
    still2, host2 = bm.demote_host_attributed(confirmed, flags_by_run, {})
    assert set(still2) == {"lane_host", "lane_code"} and host2 == {}
