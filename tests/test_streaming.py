"""Streaming semantics, deterministically (SURVEY.md §5.2): file source +
availableNow triggers + memory/parquet sinks — no Kafka, no wall clock.

These tests prove the streaming twins actually *start and run* (watermark +
dropDuplicatesWithinWatermark + append-mode window finalization are exactly
the constructs that look right and fail at ``.start()``).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.cleaning import clean_events_streaming
from kafkastreamingetl_spark.operators.windows import streaming_windowed_agg, windowed_agg
from kafkastreamingetl_spark.sources import (
    EVENT_SCHEMA,
    decode_json_events,
    file_events_source,
    synthetic_events_batch,
    synthetic_events_stream,
)
from kafkastreamingetl_spark.streaming import (
    fan_out,
    foreach_batch_sink,
    run_available_now,
    write_memory_stream,
    write_parquet_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """The sf0.001 events table rewritten as a parquet *directory* (streaming
    file sources list directories) with dirty synthetic rows appended."""
    path = str(tmp_path_factory.mktemp("events_stream_src"))
    synthetic_events_batch(spark, 2_000, seed=11).write.mode("overwrite").parquet(path)
    return path


def _stream(spark, events_dir):
    return file_events_source(spark, events_dir)


def test_file_source_is_streaming(spark, events_dir):
    assert _stream(spark, events_dir).isStreaming
    assert synthetic_events_stream(spark).isStreaming


def test_clean_events_streaming_matches_batch(spark, events_dir):
    """T1/T3: watermarked streaming dedup processes everything available and
    agrees with the batch twin on count + key uniqueness."""
    q = write_memory_stream(
        clean_events_streaming(_stream(spark, events_dir)), "cleaned_stream"
    )
    run_available_now([q])
    got = spark.table("cleaned_stream")
    batch_keys = (
        spark.read.parquet(events_dir).select("event_id").distinct().count()
    )
    assert got.count() == batch_keys
    assert got.select("event_id").distinct().count() == batch_keys
    assert got.filter(F.col("value").isNull()).count() == 0


def test_streaming_window_agg_append_mode(spark, events_dir):
    """T2/T4: append-mode windows emitted by availableNow are exactly the
    batch twin's rows for every finalized window (watermark semantics)."""
    agg = streaming_windowed_agg(
        _stream(spark, events_dir),
        watermark="30 seconds",
        window="1 minute",
        slide="30 seconds",
        keys=["event_type"],
    )
    q = write_memory_stream(agg, "windowed_stream", output_mode="append")
    run_available_now([q])
    got = spark.table("windowed_stream")

    batch = windowed_agg(
        spark.read.parquet(events_dir),
        window="1 minute",
        slide="30 seconds",
        keys=["event_type"],
        approx_distinct=True,
    )
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).collect()[0][0]
    finalized = batch.filter(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 30 SECONDS")
    )
    # every finalized window appears in the streamed append output with the
    # same aggregate values
    missing = finalized.exceptAll(
        got.select(*[c for c in finalized.columns])
    ).count()
    assert missing == 0
    # and the stream emitted at least those (it may emit a few more windows
    # that finalized exactly at the last watermark advance)
    assert got.count() >= finalized.count() > 0


def test_multi_sink_fan_out(spark, events_dir, tmp_path):
    """T8 + S4/H5/T6: one lineage, two sinks (parquet + memory), each with
    its own checkpoint; partitioned lake layout verified on disk."""
    cleaned = clean_events_streaming(_stream(spark, events_dir))
    lake = str(tmp_path / "lake")
    chk = str(tmp_path / "chk")
    queries = fan_out(
        cleaned,
        [
            lambda df: write_parquet_stream(
                df,
                lake,
                chk,
                partition_by="event_type_norm",
                available_now=True,
            ),
            lambda df: write_memory_stream(df, "fanout_mem"),
        ],
    )
    run_available_now(queries)
    dirs = {d for d in os.listdir(lake) if d.startswith("event_type_norm=")}
    assert len(dirs) >= 3  # hive layout, one dir per event type
    n_lake = spark.read.parquet(lake).count()
    assert n_lake == spark.table("fanout_mem").count() > 0


def test_console_sink_starts(spark, events_dir):
    """S5: the debug console sink (update mode) starts and drains — its
    output goes to driver stdout, so liveness (clean availableNow
    termination, no exception) is the assertable contract."""
    from kafkastreamingetl_spark.streaming import write_console_stream

    agg = streaming_windowed_agg(_stream(spark, events_dir), keys=["event_type"])
    q = write_console_stream(agg, available_now=True)
    run_available_now([q])
    assert q.exception() is None


def test_foreach_batch_bridge(spark, events_dir, tmp_path):
    """The batch-reuse bridge: micro-batches land in a collecting sink."""
    seen: list[int] = []
    q = foreach_batch_sink(
        _stream(spark, events_dir).select("event_id"),
        lambda batch_df, epoch: seen.append(batch_df.count()),
        str(tmp_path / "chk_fb"),
        available_now=True,
    )
    run_available_now([q])
    assert sum(seen) == 2_000


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """T1/T4 end-to-end: a finalized window is emitted exactly once, and an
    event arriving behind the checkpointed watermark is dropped — the
    reference's append-sink semantics (spark/app.py:160,189-197), made
    deterministic with two availableNow runs over one checkpoint."""
    import pandas as pd

    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf["props"] = "{}"
        df = spark.createDataFrame(pdf, schema=EVENT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        agg = streaming_windowed_agg(
            file_events_source(spark, src),
            watermark="30 seconds",
            window="1 minute",
            slide=None,
        )
        q = write_parquet_stream(agg, out, chk, available_now=True, trigger_seconds=None)
        run_available_now([q])

    # run 1: window [10:00,10:01) gets 2 events; watermark ends at
    # 10:04:30 >> 10:01, so that window is finalized and emitted
    write_batch("b1", [
        (1, "2024-03-01 10:00:10", 1, "click", 1.0),
        (2, "2024-03-01 10:00:50", 1, "click", 2.0),
        (3, "2024-03-01 10:05:00", 2, "view", 4.0),
    ])
    run_once()
    first = spark.read.parquet(out).toPandas()
    w1 = first[first.window_start == pd.Timestamp("2024-03-01 10:00:00")]
    assert len(w1) == 1 and float(w1.total_value.iloc[0]) == 3.0

    # run 2: one LATE event for the closed window (behind the checkpointed
    # watermark) and one fresh event that finalizes more windows
    write_batch("b2", [
        (4, "2024-03-01 10:00:30", 3, "click", 100.0),  # late -> dropped
        (5, "2024-03-01 10:09:00", 2, "view", 8.0),     # advances watermark
    ])
    run_once()
    final = spark.read.parquet(out).toPandas()
    w1 = final[final.window_start == pd.Timestamp("2024-03-01 10:00:00")]
    # still exactly one emission, late value NOT folded in
    assert len(w1) == 1 and float(w1.total_value.iloc[0]) == 3.0
    # the fresh 10:05 window was finalized by run 2's watermark advance
    w5 = final[final.window_start == pd.Timestamp("2024-03-01 10:05:00")]
    assert len(w5) == 1 and float(w5.total_value.iloc[0]) == 4.0


def test_exact_dedup_streaming_by_content(spark, tmp_path):
    """LLM-pipeline streaming: duplicate document *content* (different ids)
    is dropped within the watermark horizon; the dedup key is the 8-byte
    content hash, not the text."""
    from kafkastreamingetl_spark.operators.dedup import exact_dedup_streaming

    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "alpha beta gamma"),
            (2, "2024-01-01 10:00:05", "alpha beta gamma"),   # dup content
            (3, "2024-01-01 10:00:10", "totally different"),
            (4, "2024-01-01 10:00:15", "alpha beta gamma"),   # dup again
        ],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.to_timestamp("ts")).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    q = write_memory_stream(exact_dedup_streaming(stream), "docs_dedup")
    run_available_now([q])
    got = spark.table("docs_dedup").toPandas()
    assert len(got) == 2
    assert sorted(got.text) == ["alpha beta gamma", "totally different"]


def test_streaming_session_agg_runs(spark, events_dir):
    from kafkastreamingetl_spark.operators.windows import streaming_session_agg

    q = write_memory_stream(
        streaming_session_agg(_stream(spark, events_dir)), "sessions_stream"
    )
    run_available_now([q])
    got = spark.table("sessions_stream")
    assert got.count() > 0
    assert set(got.columns) == {
        "user_id", "session_start", "session_end", "total_value", "n_events",
    }


def test_reference_pipeline_end_to_end(spark, events_dir, tmp_path, sf_dir):
    """The reference's whole main program (spark/app.py:53-209) through the
    engine: decoded stream → clean → stream-static dim join → sliding
    window agg → hive-partitioned parquet lake, deterministically."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.streaming import reference_pipeline

    customer = load_table(spark, sf_dir, "customer")
    lake = str(tmp_path / "ref_lake")
    queries = reference_pipeline(
        _stream(spark, events_dir),
        customer,
        lake_path=lake,
        checkpoint_dir=str(tmp_path / "ref_chk"),
        available_now=True,
        trigger_seconds=None,
    )
    run_available_now(queries)
    out = spark.read.parquet(lake)
    assert out.count() > 0
    assert {"window_start", "window_end", "event_type_norm", "segment",
            "total_value", "unique_events", "n_events"} <= set(out.columns)
    # hive layout by the joined dim attribute (reference spark/app.py:194)
    assert any(d.startswith("segment=") for d in os.listdir(lake))
    # normalization happened upstream of the aggregate
    bad = out.filter(F.col("event_type_norm") != F.lower(F.trim("event_type_norm")))
    assert bad.count() == 0


def test_streaming_feeds_daily_rollup(spark, events_dir, tmp_path, sf_dir):
    """The reference's full DAG: the streaming stage lands cleaned events in
    the lake; the daily batch stage (X2) rolls the lake up — here bridged in
    one process via foreachBatch running the batch operator per micro-batch
    (SURVEY §3.3: entry point C becomes a normal Spark batch query)."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.rollup import daily_aggregate

    customer = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "rollup_lake")

    def rollup_batch(batch_df, epoch):
        daily_aggregate(batch_df, customer).write.mode("append").parquet(out)

    cleaned = clean_events_streaming(_stream(spark, events_dir))
    q = foreach_batch_sink(
        cleaned, rollup_batch, str(tmp_path / "chk_rollup"), available_now=True
    )
    run_available_now([q])

    got = spark.read.parquet(out)
    assert got.count() > 0
    assert {"event_date", "event_type", "segment", "daily_revenue"} <= set(got.columns)
    # invariant: every deduped event lands in exactly one rollup group in
    # exactly one micro-batch, so summing the per-group distinct counts
    # recovers the source's distinct-key count (revenue totals are NOT
    # comparable: streaming dedup keeps the first arrival, batch dedup the
    # deterministic (ts, value) pick — a documented semantic difference)
    stream_events = got.agg(F.sum("daily_events")).collect()[0][0]
    distinct_keys = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert stream_events == distinct_keys


def test_json_decode_roundtrip(spark):
    """S2/F1/F2: encode rows to JSON strings (the producer's wire format),
    decode through the envelope path, get the rows back."""
    events = synthetic_events_batch(spark, 500, seed=3)
    wire = events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    )
    decoded = decode_json_events(wire, EVENT_SCHEMA)
    assert decoded.schema == EVENT_SCHEMA
    assert decoded.count() == 500
    assert decoded.exceptAll(events).count() == 0


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """T6 — the contract checkpoints exist for: stop a windowed-aggregate
    query mid-stream, add data, restart with the SAME checkpoint. The
    resumed query must neither re-emit windows the first run already
    finalized (no duplicates) nor lose the in-flight state (no gaps): the
    union of both runs' parquet output is exactly one row per finalized
    window."""
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def feed(n, offset, mode, base_ts):
        synthetic_events_batch(
            spark, n, seed=51 + offset, base_ts=base_ts
        ).repartition(1).write.mode(mode).parquet(src)
        time.sleep(1.1)

    def run():
        agg = streaming_windowed_agg(
            file_events_source(spark, src),
            watermark="10 seconds",
            window="1 minute",
            slide=None,
            keys=["event_type"],
        )
        q = write_parquet_stream(
            agg, out, ckpt, available_now=True, trigger_seconds=None
        )
        run_available_now([q])

    feed(1_500, 0, "overwrite", "2024-01-01 00:00:00")
    run()  # run 1 processes the first file and stops
    first = spark.read.parquet(out).count()
    # run 2's data is LATER in event time: it finalizes run 1's in-flight
    # window (state carried across the restart) and adds new ones
    feed(1_500, 7, "append", "2024-01-01 01:00:00")
    run()  # run 2 must resume from the checkpoint, not reprocess

    got = spark.read.parquet(out)
    # exactly-once across the restart: no (window, key) emitted twice
    assert got.count() == got.select("window_start", "event_type").distinct().count()
    assert got.count() > first  # run 2 finalized new windows from run 1 state


def test_stream_static_join_rereads_dim_each_batch(spark, tmp_path):
    """Stream-static joins re-resolve the static side per micro-batch: a
    dim update between runs is visible to later batches with NO restart of
    the pipeline definition — the engine's slowly-changing-dimension
    refresh path (reference's dim is frozen in-memory; spark/app.py:87)."""
    import time

    src = str(tmp_path / "src")
    dim_path = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def feed(eid, mode):
        spark.createDataFrame(
            [(eid, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(1).write.mode(
            mode
        ).parquet(src)
        time.sleep(1.1)

    def write_dim(segment):
        spark.createDataFrame(
            [(1, segment)], "user_id long, segment string"
        ).repartition(1).write.mode("overwrite").parquet(dim_path)
        time.sleep(1.1)

    def run():
        dim = spark.read.parquet(dim_path)
        joined = file_events_source(spark, src).join(dim, "user_id", "left")
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        run_available_now([q])

    write_dim("BRONZE")
    feed(1, "overwrite")
    run()
    write_dim("GOLD")  # dim changes; the stream definition does not
    feed(2, "append")
    run()

    got = {r.event_id: r.segment for r in spark.read.parquet(out).collect()}
    assert got == {1: "BRONZE", 2: "GOLD"}
