"""Streaming state-scale evidence (VERDICT r7 item 7 / r8 item 9): ~50
micro-batches through the upsert and near-dup-flag sinks, asserting the two
properties that make them 100 TB-viable — bounded checkpoint size (both
sinks keep executor state at ZERO: no state store directory at all, the
checkpoint holds only offsets/commits) and flat per-batch latency (cost
tracks the BATCH, not the accumulated table/stream length).

Latency flatness is asserted on medians with a generous bound: a shared
local session jitters individual batches, but a per-batch cost that grew
with stream length (the failure mode: an upsert that rewrites the whole
table, an index probe that re-shuffles the full index) would trend up
monotonically and blow straight past it. Measured numbers land in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.streaming import (
    semantic_flag_sink,
    neardup_flag_sink,
    read_upserted,
    run_available_now,
    upsert_parquet_sink,
)

pytestmark = pytest.mark.slow

N_BATCHES = 50


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _progress(q) -> list[dict]:
    return [json.loads(p.json) for p in (q.recentProgress or [])]


def _batch_durations(q) -> list[float]:
    out = []
    for p in _progress(q):
        if p.get("numInputRows", 0) > 0:
            out.append(p["durationMs"]["triggerExecution"] / 1000.0)
    return out


def _assert_flat_and_stateless(q, ckpt: str, label: str) -> dict:
    durs = _batch_durations(q)
    assert len(durs) == N_BATCHES, f"{label}: {len(durs)} batches"
    # skip the first 5 (table/index creation, codegen warm) and compare
    # median halves: a per-batch cost growing with stream length would put
    # the second half well past 3x the first
    head = statistics.median(durs[5 : N_BATCHES // 2])
    tail = statistics.median(durs[N_BATCHES // 2 :])
    assert tail < 3 * head, f"{label}: latency trend {head:.2f}s -> {tail:.2f}s"
    # checkpoint = offsets/commits only; no state store directory at all
    # (both sinks are foreachBatch with zero executor state), and the whole
    # thing stays KB-scale after 50 batches
    state_dir = os.path.join(ckpt, "state")
    assert not os.path.isdir(state_dir) or _dir_bytes(state_dir) == 0, label
    ckpt_bytes = _dir_bytes(ckpt)
    assert ckpt_bytes < 2 * 1024 * 1024, f"{label}: checkpoint {ckpt_bytes}B"
    return {
        "label": label,
        "median_head_s": round(head, 3),
        "median_tail_s": round(tail, 3),
        "checkpoint_kb": round(ckpt_bytes / 1024, 1),
    }


def test_upsert_sink_50_batches_flat_latency_bounded_checkpoint(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # batch i: 40 rows, keys 30i..30i+39 — the 10-key overlap with the
    # next batch exercises the merge/correction leg every batch. The
    # partition column is a pure function of the KEY (bucket of 300 keys:
    # the sink's immutable-partition contract), so a batch's blast radius
    # is 1-2 buckets of <=300 keys — bounded, never table-sized.
    base = spark.range(40).select(F.col("id").alias("k"))
    for i in range(N_BATCHES):
        rows = base.select(
            (F.col("k") + i * 30).alias("event_id"),
            F.expr(
                f"timestamp'2024-01-01 00:00:00' + make_dt_interval(0, {i}, 0, 0)"
            ).alias("ts"),
            (F.col("k") % 7).alias("user_id"),
            F.lit("purchase").alias("event_type"),
            (F.col("k") * 1.5 + i).alias("value"),
            F.lit("{}").alias("props"),
        ).withColumn(
            "kbucket", (F.col("event_id") / 300).cast("int")
        )
        rows.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = upsert_parquet_sink(
        stream,
        table,
        ckpt,
        key_cols=["event_id"],
        order_col="ts",
        partition_col="kbucket",
        available_now=True,
    )
    run_available_now([q], timeout_sec=900)
    stats = _assert_flat_and_stateless(q, ckpt, "upsert_parquet_sink")

    # merge correctness at the end of the run: one live row per key
    live = read_upserted(spark, table)
    n_keys = live.select("event_id").distinct().count()
    assert live.count() == n_keys
    # 40 rows/batch advancing by 30 -> keys 0..(49*30+39)
    assert n_keys == 49 * 30 + 40
    print("SCALE.md numbers:", stats)


def test_neardup_flag_sink_50_batches_flat_latency_bounded_checkpoint(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    out = str(tmp_path / "report")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    words = "the quick brown fox jumps over a lazy dog near the river bank"
    for i in range(N_BATCHES):
        docs = spark.range(12).select(
            (F.col("id") + i * 12).alias("doc_id"),
            F.concat(
                F.lit(words + " "),
                F.lit(f"batch {i} variant "),
                F.col("id").cast("string"),
                F.lit(" " + words),
            ).alias("text"),
        )
        docs.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = neardup_flag_sink(stream, out, index, ckpt, available_now=True)
    run_available_now([q], timeout_sec=900)
    stats = _assert_flat_and_stateless(q, ckpt, "neardup_flag_sink")

    report = spark.read.parquet(out)
    # one report partition per batch, every doc reported exactly once
    assert report.select("batch_id").distinct().count() == N_BATCHES
    assert report.count() == N_BATCHES * 12
    # the shared base text makes later batches near-dups of earlier ones:
    # the persisted index must actually flag across batches
    flagged = report.where(F.col("n_index_bands") > 0).count()
    assert flagged > 0
    print("SCALE.md numbers:", stats)


def test_semantic_flag_sink_50_batches_flat_latency_bounded_checkpoint(
    spark, tmp_path
):
    """The embedding twin under the same 50-batch gate: the persisted
    signature index grows, but per-batch cost tracks the BATCH (probe =
    bucket equi-join against an 8-byte-signature index, never vectors)."""
    import random

    src = str(tmp_path / "src")
    out = str(tmp_path / "report")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    rng = random.Random(5)
    base = [rng.uniform(-0.3, 0.3) for _ in range(64)]
    for i in range(N_BATCHES):
        rows = []
        for j in range(8):
            if j % 2 == 0:
                # tiny jitter on a shared anchor: near-dups across batches
                vec = [v + 0.0001 * ((i * 8 + j) % 7) for v in base]
            else:
                vec = [rng.uniform(-0.3, 0.3) for _ in range(64)]
            rows.append((i * 8 + j, vec))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = semantic_flag_sink(stream, out, index, ckpt, available_now=True)
    run_available_now([q], timeout_sec=900)
    stats = _assert_flat_and_stateless(q, ckpt, "semantic_flag_sink")

    report = spark.read.parquet(out)
    assert report.select("batch_id").distinct().count() == N_BATCHES
    assert report.count() == N_BATCHES * 8
    # the shared anchor must flag against the index across batches
    flagged = report.where(F.col("n_index_buckets") > 0).count()
    assert flagged > 0
    print("SCALE.md numbers:", stats)


def test_frequent_tokens_stream_50_batches_flat_latency_bounded_state(
    spark, tmp_path
):
    """The stateful MG stream under the same 50-batch gate — with the
    assertion its design actually makes: state is BOUNDED (n_groups
    summaries of <= capacity+1 entries, never the vocabulary), not zero.
    The vocabulary grows every batch (fresh cold tokens), so a token-keyed
    streaming count would grow state linearly; the summary stays fixed and
    per-batch latency flat."""
    import random
    import statistics

    from kafkastreamingetl_spark.operators.corpus import (
        frequent_tokens_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cap, groups = 15, 4
    rng = random.Random(9)
    for i in range(N_BATCHES):
        # hot head + batch-fresh cold tail: vocabulary grows 60 words per
        # batch (~3000 over the run) while the summaries must not
        vocab = ["hot1", "hot2", "hot3"] * 8 + [
            f"b{i}w{j}" for j in range(60)
        ]
        texts = [
            (i * 10 + j, " ".join(rng.choices(vocab, k=25)))
            for j in range(10)
        ]
        spark.createDataFrame(
            texts, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = frequent_tokens_stream(stream, capacity=cap, n_groups=groups)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_state_scale")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    run_available_now([q], timeout_sec=900)

    durs = _batch_durations(q)
    assert len(durs) == N_BATCHES
    head = statistics.median(durs[5 : N_BATCHES // 2])
    tail = statistics.median(durs[N_BATCHES // 2 :])
    assert tail < 3 * head, f"latency trend {head:.2f}s -> {tail:.2f}s"

    # bounded state: the store exists (unlike the foreachBatch sinks) but
    # holds n_groups MG summaries, not the ~3000-word vocabulary — KB-scale
    # after 50 batches including retained versions
    state_dir = os.path.join(ckpt, "state")
    assert os.path.isdir(state_dir)
    state_bytes = _dir_bytes(state_dir)
    assert state_bytes < 8 * 1024 * 1024, f"state {state_bytes}B"

    # final emissions: <= capacity entries per group, hot head present
    emissions = spark.sql("select * from mg_state_scale").toPandas()
    latest = {}
    for grp, g in emissions.groupby("grp"):
        latest[grp] = g[g["grp_total"] == g["grp_total"].max()]
    assert all(len(g) <= cap for g in latest.values())
    survivors = {t for g in latest.values() for t in g["token"]}
    assert {"hot1", "hot2", "hot3"} <= survivors
    print(
        "SCALE.md numbers:",
        {
            "label": "frequent_tokens_stream",
            "median_head_s": round(head, 3),
            "median_tail_s": round(tail, 3),
            "state_kb": round(state_bytes / 1024, 1),
        },
    )


def test_neardup_ingest_sink_50_batches_flat_latency_bounded_checkpoint(
    spark, tmp_path
):
    """The DROP-deciding ingest loop under the same 50-batch gate: the
    persisted index accretes every batch's survivor signatures, but the
    per-batch cost tracks the BATCH (probe = (band, sig) equi-join against
    the 3-column index, survivors localCheckpoint-pinned, partition-scoped
    writes) — and the survivor arithmetic stays exact across the run."""
    import random

    from kafkastreamingetl_spark.streaming import neardup_ingest_sink

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(200)]

    def fresh_text() -> str:
        return " ".join(rng.choice(vocab) for _ in range(40))

    batch0 = [(j, fresh_text()) for j in range(10)]
    dup_sources = [batch0[0][1], batch0[1][1]]
    all_batches = [batch0]
    for i in range(1, N_BATCHES):
        rows = [(i * 10 + j, fresh_text()) for j in range(8)]
        rows += [
            (i * 10 + 8, dup_sources[0]),
            (i * 10 + 9, dup_sources[1]),
        ]
        all_batches.append(rows)
    for rows in all_batches:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = neardup_ingest_sink(stream, corpus, index, ckpt, available_now=True)
    run_available_now([q], timeout_sec=900)
    stats = _assert_flat_and_stateless(q, ckpt, "neardup_ingest_sink")

    # exact survivor arithmetic: batch 0 keeps all 10; every later batch
    # keeps its 8 fresh docs and drops the 2 exact copies of batch-0
    # survivors via the accreted index
    live = spark.read.parquet(corpus)
    assert live.count() == 10 + (N_BATCHES - 1) * 8
    dropped = {r.doc_id for r in live.select("doc_id").collect()}
    for i in range(1, N_BATCHES):
        assert i * 10 + 8 not in dropped and i * 10 + 9 not in dropped
    print("SCALE.md numbers:", stats)
