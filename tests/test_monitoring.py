"""Streaming progress recorder: captures batch telemetry, exposes it as a
DataFrame, and survives multi-query runs."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kafkastreamingetl_spark import monitoring
from kafkastreamingetl_spark.operators.cleaning import clean_events_streaming
from kafkastreamingetl_spark.sources import file_events_source, synthetic_events_batch
from kafkastreamingetl_spark.streaming import run_available_now, write_memory_stream


def test_progress_recorder_captures_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    synthetic_events_batch(spark, 1_000, seed=13).write.parquet(src)

    rec = monitoring.attach(spark)
    try:
        q = write_memory_stream(
            clean_events_streaming(file_events_source(spark, src)), "mon_stream"
        )
        run_available_now([q])
        # listener callbacks are async wrt awaitTermination
        deadline = time.time() + 30
        while time.time() < deadline and not any(
            r[5] > 0 for r in rec.rows()
        ):
            time.sleep(0.2)
    finally:
        monitoring.detach(spark, rec)

    frame = monitoring.progress_frame(spark, rec)
    rows = frame.where(F.col("num_input_rows") > 0).collect()
    assert rows, "no progress captured"
    assert all(r.batch_duration_ms >= 0 for r in rows)
    # the dedup state operator reports its rows through the same event
    assert any(r.state_rows_total > 0 for r in rows)

    summary = monitoring.batch_duration_summary(frame).collect()
    assert sum(r.total_rows for r in summary) >= 1_000
