"""Custom stateful sessionizer (applyInPandasWithState) vs the batch twin.

The batch ``session_agg`` is oracle-checked against DuckDB; proving the
custom streaming operator emits the same sessions transitively anchors it
to the oracle. Sessions still open when the stream ends (watermark never
passed session_end, no later event closed them) legitimately stay in
state — the comparison excludes exactly those.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.stateful import sessionize_stream
from kafkastreamingetl_spark.operators.windows import session_agg
from kafkastreamingetl_spark.sources import EVENT_SCHEMA, synthetic_events_batch
from kafkastreamingetl_spark.streaming import run_available_now, write_memory_stream

GAP_S = 600
WATERMARK_S = 10


@pytest.fixture()
def events_path(spark, tmp_path) -> str:
    path = str(tmp_path / "events")
    # one file -> one micro-batch -> per-user event-time order is guaranteed
    # by the in-batch sort, matching the operator's cross-batch contract
    synthetic_events_batch(spark, 3_000, seed=21).coalesce(1).write.parquet(path)
    return path


def test_stateful_sessionizer_matches_batch_twin(spark, events_path):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_path)
    sessions = sessionize_stream(
        stream, gap_seconds=GAP_S, watermark=f"{WATERMARK_S} seconds"
    )
    q = write_memory_stream(sessions, "custom_sessions")
    run_available_now([q])
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in spark.table("custom_sessions").collect()
    }

    batch_df = spark.read.parquet(events_path)
    expected_all = session_agg(batch_df, gap=f"{GAP_S} seconds").collect()
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    # a session is provably closed iff a later same-user event exceeded the
    # gap (in-batch close) or the final watermark passed session_end
    # (timeout close); the final watermark is max_ts - delay
    last_start = {}
    for r in expected_all:
        k = r.user_id
        if k not in last_start or r.session_start > last_start[k]:
            last_start[k] = r.session_start
    import datetime

    final_wm = max_ts - datetime.timedelta(seconds=WATERMARK_S)
    expected = {
        # operator fills null metrics with 0 (P5 contract) where SQL SUM
        # over an all-null session yields NULL — normalize for comparison
        (r.user_id, r.session_start, r.session_end): (
            r.n_events,
            r.total_value if r.total_value is not None else 0.0,
        )
        for r in expected_all
        if r.session_start < last_start[r.user_id] or r.session_end < final_wm
    }
    assert set(got) == set(expected)
    for k, (n, total) in expected.items():
        gn, gt = got[k]
        assert gn == n, k
        assert abs(gt - total) < 1e-9, k  # scaled-int sum == decimal sum
    # and the run must have exercised both closure paths at this scale
    assert len(expected) > 50


def test_stateful_sessionizer_emits_nothing_before_closure(spark, tmp_path):
    """A single user's single burst (no gap exceeded, watermark never past
    session_end) must remain in state — zero rows emitted."""
    path = str(tmp_path / "burst")
    rows = [(i, f"2024-01-01 00:0{i}:00", 1, "click", 1.0, "{}") for i in range(3)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    q = write_memory_stream(
        sessionize_stream(stream, gap_seconds=GAP_S, watermark="10 seconds"),
        "burst_sessions",
    )
    run_available_now([q])
    assert spark.table("burst_sessions").count() == 0


# ---------------------------------------------------------------------------
# transformWithState running totals (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state-server protocol needs "
    "google.protobuf (not installed in this container)",
)
def test_transform_with_state_running_totals_match_batch(spark, tmp_path):
    """Across multiple micro-batches (one file each), the final emission
    per user equals the batch groupBy aggregate — the differential anchor
    for the transformWithState surface. Totals are monotone, so 'final'
    = the row with the highest n_events per user."""
    from kafkastreamingetl_spark.functions import dsum
    from kafkastreamingetl_spark.operators.stateful import running_totals_stream

    path = str(tmp_path / "events_tws")
    synthetic_events_batch(spark, 2_000, seed=33).repartition(3).write.parquet(path)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = write_memory_stream(
        running_totals_stream(stream), "tws_totals", output_mode="update"
    )
    run_available_now([q])

    emitted = spark.table("tws_totals").collect()
    assert emitted, "no rows emitted"
    final = {}
    for r in emitted:
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r

    batch = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.coalesce(F.col("value"), F.lit(0.0)), "total_value"),
        )
        .collect()
    )
    expected = {r.user_id: r for r in batch}
    assert set(final) == set(expected)
    for uid, r in expected.items():
        g = final[uid]
        assert g.n_events == r.n_events, uid
        assert abs(g.total_value - (r.total_value or 0.0)) < 1e-9, uid

    # multi-batch actually happened: some user must have emitted more than
    # one running row (3 input files -> 3 micro-batches)
    from collections import Counter

    per_user_rows = Counter(r.user_id for r in emitted)
    assert max(per_user_rows.values()) > 1


def test_transform_with_state_constructs(spark, tmp_path):
    """Plan construction (analysis, schema) works without the protobuf
    runtime dependency — the construct-only coverage this container can
    give the transformWithState surface."""
    from kafkastreamingetl_spark.operators.stateful import (
        RUNNING_SCHEMA,
        running_totals_stream,
    )

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(tmp_path))
    out = running_totals_stream(stream)
    assert out.isStreaming
    assert out.schema == RUNNING_SCHEMA
