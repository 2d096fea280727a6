"""value_drift_profile (operators/quality) — hand-computed TVD cases."""

from __future__ import annotations

import datetime

from kafkastreamingetl_spark.operators.quality import value_drift_profile


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )


def _t(s):
    return datetime.datetime.fromisoformat(s)


def test_complete_shift_is_tvd_one_and_stable_is_zero(spark):
    rows = []
    eid = 0
    # key "a": first half all 1.00 (3-digit cents), second half all 10.00
    # (4-digit cents) -> disjoint buckets -> TVD = 1.0
    for day, v in [(1, 1.0), (2, 1.0), (28, 10.0), (29, 10.0)]:
        eid += 1
        rows.append((eid, _t(f"2024-01-{day:02d} 00:00:00"), 1, "a", v, None))
    # key "b": identical single-bucket distribution in both halves -> 0.0
    for day in (1, 2, 28, 29):
        eid += 1
        rows.append((eid, _t(f"2024-01-{day:02d} 00:00:00"), 1, "b", 5.0, None))
    out = {r.event_type: r for r in value_drift_profile(_ev(spark, rows)).collect()}
    assert out["a"].tvd == 1.0
    assert out["b"].tvd == 0.0
    assert out["a"].n_first == 2 and out["a"].n_second == 2


def test_half_shift_is_half_and_single_half_key_is_null(spark):
    rows = []
    eid = 0
    # key "a" first half: two 1.00; second half: one 1.00, one 10.00
    # -> TVD = 0.5*(|1 - 0.5| + |0 - 0.5|) = 0.5
    for day, v in [(1, 1.0), (2, 1.0), (28, 1.0), (29, 10.0)]:
        eid += 1
        rows.append((eid, _t(f"2024-01-{day:02d} 00:00:00"), 1, "a", v, None))
    # key "c" exists only in the first half -> tvd NULL (not 0, not NaN)
    eid += 1
    rows.append((eid, _t("2024-01-01 12:00:00"), 1, "c", 2.0, None))
    out = {r.event_type: r for r in value_drift_profile(_ev(spark, rows)).collect()}
    assert out["a"].tvd == 0.5
    assert out["c"].tvd is None
    assert out["c"].n_second == 0


def test_sign_and_zero_buckets_are_distinct(spark):
    # -1.00 (bucket -3) vs 1.00 (bucket 3) must NOT share a bucket;
    # 0.0 lands in bucket 1 (one digit of "0")
    rows = [
        (1, _t("2024-01-01 00:00:00"), 1, "a", -1.0, None),
        (2, _t("2024-01-02 00:00:00"), 1, "a", 0.0, None),
        (3, _t("2024-01-28 00:00:00"), 1, "a", 1.0, None),
        (4, _t("2024-01-29 00:00:00"), 1, "a", 0.0, None),
    ]
    [r] = value_drift_profile(_ev(spark, rows)).collect()
    # first half {-3: 1, 1: 1}, second {3: 1, 1: 1} -> TVD = 0.5*(0.5+0.5+0)
    assert r.tvd == 0.5
    assert r.n_buckets == 3


def test_drift_products_are_decimal_widened_before_multiply(spark):
    # The c·n cross-products overflow int64 at >~3e9 rows per key-half —
    # unreachable in a unit test, so assert the guard structurally: every
    # multiply in the analyzed plan runs on DECIMAL(19,0) operands (the
    # widening from skew.py applied here), and the DuckDB oracle widens
    # to HUGEINT before its products.
    from kafkastreamingetl_spark.operators.quality import (
        sql_value_drift_profile,
    )

    df = value_drift_profile(
        _ev(spark, [(1, _t("2024-01-01 00:00:00"), 1, "a", 1.0, None)])
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    # the two cross-products and the divisor product all cast operands
    assert plan.count("decimal(19,0)") >= 6, plan
    sql = sql_value_drift_profile()
    assert sql.count("HUGEINT") >= 3
