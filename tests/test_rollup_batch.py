"""The daily batch pipeline (X2): rank ties, run-date slice + pushdown,
partitioned write layout, empty-input guard, quality check.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.catalog import load_events, load_table
from kafkastreamingetl_spark.operators.rollup import (
    daily_segment_metrics,
    filter_run_date,
    is_empty,
    quality_check,
    run_daily_batch,
)

RUN_DATE = "2024-01-15"


def _explain(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_rank_ties_use_row_number_semantics(spark):
    # two segments with identical revenue: ranks must be distinct and
    # assigned by the segment tiebreaker (pandas cumcount+1 semantics,
    # reference kafka_spark_etl.py:73-78; SURVEY.md §7.2d)
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 10.0),
         (2, "2024-01-01 00:00:00", 2, "click", 10.0)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    ).withColumn("ts", F.to_timestamp("ts"))
    customer = spark.createDataFrame(
        [(1, "SEG_B", 0.0), (2, "SEG_A", 0.0)],
        ["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    out = daily_segment_metrics(events, customer).orderBy("revenue_rank_in_type").collect()
    assert [(r.segment, r.revenue_rank_in_type) for r in out] == [
        ("SEG_A", 1),
        ("SEG_B", 2),
    ]


def test_run_date_slice_pushes_down(spark, sf_dir):
    ev = load_events(spark, sf_dir, ts_start=RUN_DATE, ts_end="2024-01-16")
    plan = _explain(ev)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    assert "GreaterThanOrEqual(ts" in pushed[0] and "LessThan(ts" in pushed[0], pushed[0]
    # and the slice is semantically identical to the logical-filter path
    ev_all = load_table(spark, sf_dir, "events")
    expected = filter_run_date(ev_all, RUN_DATE).count()
    assert ev.count() == expected > 0


def test_run_daily_batch_end_to_end(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "metrics")
    n = run_daily_batch(events, customer, RUN_DATE, output_path=out)
    assert n > 0
    # H5: hive-partitioned layout, one dir per event_date
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert dirs == [f"event_date={RUN_DATE}"]
    # read-back equals the computed metrics row count
    assert spark.read.parquet(out).count() == n


def test_incremental_daily_writes_preserve_prior_dates(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic: a later run_date's overwrite must not
    destroy earlier date partitions, and re-running the SAME date must be
    idempotent (replace, not append) — the reference's nightly batch writes
    one day per run and never truncates history (kafka_spark_etl.py:102-107)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "metrics")
    n1 = run_daily_batch(events, customer, "2024-01-15", output_path=out)
    n2 = run_daily_batch(events, customer, "2024-01-16", output_path=out)
    assert n1 > 0 and n2 > 0
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_date="))
    assert dirs == ["event_date=2024-01-15", "event_date=2024-01-16"]
    assert spark.read.parquet(out).count() == n1 + n2
    # idempotent re-run of day 16: same total, no duplicated rows
    assert run_daily_batch(events, customer, "2024-01-16", output_path=out) == n2
    assert spark.read.parquet(out).count() == n1 + n2


def test_empty_input_guard(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    assert is_empty(filter_run_date(events, "1999-01-01"))
    assert run_daily_batch(events, customer, "1999-01-01") == 0


def test_quality_check_warns_and_fails(spark):
    empty = spark.range(0)
    with pytest.warns(UserWarning, match="0 rows"):
        assert quality_check(empty) == 0
    with pytest.raises(ValueError, match="0 rows"):
        quality_check(empty, fail=True)
    assert quality_check(spark.range(3)) == 3


def test_observe_qc_rides_the_write_action(spark, tmp_path):
    """observe_qc: metrics arrive from the SAME action that wrote the
    table — the job counter shows exactly one job between write start and
    metric read, and the facts match what landed on disk."""
    from kafkastreamingetl_spark.operators.quality import observe_qc

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 1.0), (3, "b", None)],
        "id long, k string, value double",
    )
    observed, obs = observe_qc(df, "t_qc", key_cols=("k",), value_col="value")
    path = str(tmp_path / "observed_out")
    observed.write.parquet(path)
    facts = obs.get
    assert facts["n_rows"] == 3
    assert facts["n_null_k"] == 1
    assert float(facts["total_value"]) == 3.5
    assert spark.read.parquet(path).count() == 3
