"""TWAP and lag-1 autocorrelation (operators/timeseries) — constructed
series with hand-computed answers, plus the edge semantics the docstrings
promise (single-event keys, gaps, constant series)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.timeseries import (
    daily_autocorr,
    time_weighted_value,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_twap_weights_by_hold_time(spark):
    # value 10 holds 10 s, value 20 holds 20 s; the 40 at the end never
    # holds (no next event). TWAP = (10*10 + 20*20)/30.
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "a", 10.0, None),
            (2, _ts("2024-01-01 00:00:10"), 1, "a", 20.0, None),
            (3, _ts("2024-01-01 00:00:30"), 1, "a", 40.0, None),
        ],
    )
    [r] = time_weighted_value(df).collect()
    assert r.event_type == "a"
    assert r.n_steps == 2
    assert r.span_seconds == 30.0
    assert math.isclose(r.twap_value, 500.0 / 30.0)


def test_twap_single_event_key_absent_and_null_value_spans_gap(spark):
    # key "b" has one event -> no step -> no row (NOT a zero).
    # key "a": the null-valued middle event is a non-observation, so the
    # 10 holds straight through to t=30 (one 30 s step).
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "a", 10.0, None),
            (2, _ts("2024-01-01 00:00:10"), 1, "a", None, None),
            (3, _ts("2024-01-01 00:00:30"), 1, "a", 20.0, None),
            (4, _ts("2024-01-01 00:00:00"), 2, "b", 5.0, None),
        ],
    )
    rows = {r.event_type: r for r in time_weighted_value(df).collect()}
    assert set(rows) == {"a"}
    assert rows["a"].n_steps == 1
    assert math.isclose(rows["a"].twap_value, 10.0)


def test_twap_equal_timestamps_zero_width_step(spark):
    # two events share a timestamp: the lower event_id's step is
    # zero-width (deterministic total order), so only the survivor's
    # value weights the 10 s span.
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "a", 99.0, None),
            (2, _ts("2024-01-01 00:00:00"), 1, "a", 10.0, None),
            (3, _ts("2024-01-01 00:00:10"), 1, "a", 20.0, None),
        ],
    )
    [r] = time_weighted_value(df).collect()
    assert r.n_steps == 2  # the zero-width step still counts as a step
    assert math.isclose(r.twap_value, 10.0)


def test_autocorr_perfect_positive_and_gap_breaks_pairs(spark):
    # daily totals 1,2,3 then a GAP then 10: pairs are (1,2),(2,3) only —
    # a shifted-by-constant pair set, so r = 1 exactly.
    rows = []
    eid = 0
    for day, total in [(1, 1), (2, 2), (3, 3), (5, 10)]:
        eid += 1
        rows.append(
            (eid, _ts(f"2024-01-0{day} 12:00:00"), 1, "a", float(total), None)
        )
    [r] = daily_autocorr(_events(spark, rows)).collect()
    assert r.n_pairs == 2
    assert math.isclose(r.autocorr_lag1, 1.0)


def test_autocorr_constant_series_is_null_not_nan(spark):
    rows = [
        (d, _ts(f"2024-01-0{d} 12:00:00"), 1, "a", 5.0, None)
        for d in (1, 2, 3)
    ]
    [r] = daily_autocorr(_events(spark, rows)).collect()
    assert r.n_pairs == 2
    assert r.autocorr_lag1 is None


def test_autocorr_alternating_series_is_negative(spark):
    rows = [
        (d, _ts(f"2024-01-0{d} 12:00:00"), 1, "a", v, None)
        for d, v in [(1, 1.0), (2, 9.0), (3, 1.0), (4, 9.0), (5, 1.0)]
    ]
    [r] = daily_autocorr(_events(spark, rows)).collect()
    assert r.n_pairs == 4
    assert math.isclose(r.autocorr_lag1, -1.0)


def test_twap_and_autocorr_windows_are_partitioned(spark, sf_dir):
    from kafkastreamingetl_spark.catalog import load_events
    from kafkastreamingetl_spark.plans import plan_shape_and_text
    from tests.test_plan_shapes import _unpartitioned_window_specs

    ev = load_events(spark, sf_dir)
    for df in (time_weighted_value(ev), daily_autocorr(ev)):
        _, text = plan_shape_and_text(df)
        assert not _unpartitioned_window_specs(text)


def test_twap_wide_domain_no_int64_wrap(spark):
    # $3000 (300_000 cents) held across a ~1-year gap: cents*dt in raw
    # int64 is 300_000 * 3.1536e13 us ~ 9.46e18 > 2^63-1. The widened
    # DECIMAL(19,0) operands must survive (ANSI would raise on the wrap)
    # and give the exact single-step TWAP.
    year_us = 365 * 24 * 3600
    df = _events(
        spark,
        [
            (1, _ts("2023-01-01 00:00:00"), 1, "a", 3000.0, None),
            (2, _ts("2024-01-01 00:00:00"), 1, "a", 3000.0, None),
        ],
    )
    [r] = time_weighted_value(df).collect()
    assert r.n_steps == 1
    assert r.span_seconds == float(year_us)
    assert math.isclose(r.twap_value, 3000.0)


def test_trend_wide_domain_no_int64_wrap(spark):
    # Daily total of 9e15 cents (value 9e13, exact in double) at day
    # offsets 0 and 2000: sxy = 2000 * 9e15 = 1.8e19 > 2^63-1 in raw
    # int64. Widened products must survive and give slope 0 exactly.
    from kafkastreamingetl_spark.operators.timeseries import daily_value_trend

    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "t", 9.0e13, None),
            (2, _ts("2029-06-23 00:00:00"), 1, "t", 9.0e13, None),
        ],
    )
    [r] = daily_value_trend(df).collect()
    assert r.n_days == 2
    assert r.slope_per_day == 0.0
    assert math.isclose(r.intercept, 9.0e13)


# ---------------------------------------------------------------------------
# daily_volume_cusum
# ---------------------------------------------------------------------------


def _cusum_events(spark, counts_by_day: dict[str, list[int]]):
    """One event row per count unit; day i = 2024-01-(i+1)."""
    import datetime

    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for key, counts in counts_by_day.items():
        for i, c in enumerate(counts):
            day = datetime.datetime(2024, 1, 1 + i)
            for _ in range(c):
                rows.append((eid, key, day))
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )


def _py_cusum(counts: list[int]) -> tuple[int, int]:
    """Reference recursive CUSUM on the scaled-integer devs: returns
    (max C, index of earliest peak day)."""
    dd, n = len(counts), sum(counts)
    c = best = 0
    best_i = 0
    for i, x in enumerate(counts):
        c = max(0, c + (x * dd - n))
        if c > best:
            best, best_i = c, i
    return best, best_i


def test_cusum_step_up_detected_at_step(spark):
    from kafkastreamingetl_spark.operators.timeseries import daily_volume_cusum

    counts = [2, 2, 2, 2, 6, 6, 6, 6]  # rate doubles on day 5
    ev = _cusum_events(spark, {"click": counts})
    r = daily_volume_cusum(ev).collect()[0]
    want_max, want_i = _py_cusum(counts)
    assert r.n_days == 8
    assert r.max_cusum_scaled == float(want_max)
    assert r.peak_day.isoformat() == f"2024-01-0{want_i + 1}"
    assert abs(r.shift_share - want_max / (sum(counts) * 8)) < 1e-15
    # the peak of a step-up series is its last day
    assert want_i == 7


def test_cusum_flat_series_is_zero(spark):
    from kafkastreamingetl_spark.operators.timeseries import daily_volume_cusum

    ev = _cusum_events(spark, {"view": [3, 3, 3, 3]})
    r = daily_volume_cusum(ev).collect()[0]
    assert r.max_cusum_scaled == 0.0 and r.shift_share == 0.0
    # C never rises above 0, so every day ties at the max; earliest wins
    assert r.peak_day.isoformat() == "2024-01-01"


def test_cusum_matches_recursive_reference_seeded(spark):
    """Closed form (S - running min S) == the textbook recursion, on
    seeded random series per key, regardless of partitioning."""
    import random

    from kafkastreamingetl_spark.operators.timeseries import daily_volume_cusum

    rng = random.Random(3)
    series = {
        f"k{j}": [rng.randint(0, 9) + (5 if i > rng.randint(3, 8) else 0)
                  for i in range(12)]
        for j in range(4)
    }
    # drop zero-count days (no event rows exist for them)
    observed = {k: [c for c in v if c > 0] for k, v in series.items()}
    ev = _cusum_events(spark, observed).repartition(7)
    got = {r.event_type: r for r in daily_volume_cusum(ev).collect()}
    for k, counts in observed.items():
        want_max, _ = _py_cusum(counts)
        assert got[k].max_cusum_scaled == float(want_max), k


# ---------------------------------------------------------------------------
# user_interarrival_stats (round 10)
# ---------------------------------------------------------------------------


def test_user_interarrival_stats_hand_computed(spark):
    """User 1: gaps of 10 s and 60 s -> mean 35, one sub-minute burst.
    User 2: single event -> n_gaps 0, NULL gap stats. Equal timestamps
    order by event_id and yield a deterministic zero gap (user 3)."""
    from datetime import datetime

    from kafkastreamingetl_spark.operators.timeseries import (
        user_interarrival_stats,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t10 = datetime(2024, 1, 1, 0, 0, 10)
    t70 = datetime(2024, 1, 1, 0, 1, 10)
    ev = spark.createDataFrame(
        [
            (1, 1, t0),
            (2, 1, t10),
            (3, 1, t70),
            (4, 2, t0),
            (5, 3, t0),
            (6, 3, t0),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    rows = {r.user_id: r for r in user_interarrival_stats(ev).collect()}
    u1 = rows[1]
    assert (u1.n_events, u1.n_gaps) == (3, 2)
    assert u1.mean_gap_sec == 35.0
    assert (u1.min_gap_sec, u1.max_gap_sec) == (10.0, 60.0)
    assert u1.n_burst_gaps == 1
    u2 = rows[2]
    assert (u2.n_events, u2.n_gaps, u2.n_burst_gaps) == (1, 0, 0)
    assert u2.mean_gap_sec is None and u2.max_gap_sec is None
    u3 = rows[3]
    assert (u3.n_gaps, u3.min_gap_sec, u3.n_burst_gaps) == (1, 0.0, 1)
