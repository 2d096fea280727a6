"""Streaming cross-batch contamination DIFF: the accreted-index loop.

Each micro-batch's report must flag exact re-crawls and 13-gram verbatim
passages against everything earlier batches contributed — and NOTHING
against later batches (the index probe is strictly batch_id < current).
The report assembly is the same ``contamination_report`` the batch
operator runs, so one differential here pins streaming == batch.
"""

from __future__ import annotations

import pytest

from kafkastreamingetl_spark.streaming import (
    contamination_diff_sink,
    run_available_now,
)

PASSAGE = " ".join(f"tok{i}" for i in range(13))  # exactly one 13-gram


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, src, report, index, ckpt):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = contamination_diff_sink(stream, report, index, ckpt, available_now=True)
    run_available_now([q])


def _report(spark, path):
    return {
        r.doc_id: (r.exact_dup, r.n_gram_collisions, r.contaminated, r.batch_id)
        for r in spark.read.parquet(path).collect()
    }


@pytest.fixture()
def paths(tmp_path):
    return tuple(str(tmp_path / p) for p in ("src", "report", "index", "ckpt"))


def test_contamination_accretes_across_batches(spark, paths):
    src, report, index, ckpt = paths
    # batch 0: bootstrap — nothing can be contaminated
    _docs(
        spark,
        [
            (1, "original corpus document alpha"),
            (2, f"long prose embedding {PASSAGE} midway through"),
        ],
    ).write.parquet(src)
    _run(spark, src, report, index, ckpt)
    rep = _report(spark, report)
    assert rep[1] == (False, 0, False, 0)
    assert rep[2] == (False, 0, False, 0)

    # batch 1: one verbatim re-crawl of doc 1, one doc quoting doc 2's
    # 13-gram passage, one clean doc
    _docs(
        spark,
        [
            (10, "original corpus document alpha"),       # exact re-crawl
            (11, f"a later doc quoting {PASSAGE} verbatim"),  # gram leak
            (12, "fresh unrelated material entirely"),
        ],
    ).write.mode("append").parquet(src)
    _run(spark, src, report, index, ckpt)
    rep = _report(spark, report)
    assert rep[10][0] is True and rep[10][2] is True
    assert rep[11][0] is False and rep[11][1] == 1 and rep[11][2] is True
    assert rep[12] == (False, 0, False, 1)

    # batch 2: re-crawl of a BATCH-1 doc — the index must have accreted
    _docs(spark, [(20, "fresh unrelated material entirely")]).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, report, index, ckpt)
    rep = _report(spark, report)
    assert rep[20][0] is True and rep[20][3] == 2


def test_streaming_report_matches_batch_operator(spark, paths):
    """Differential: run the stream over (index batch, probe batch), then
    compute the SAME split with the batch operator's shared assembly —
    row-identical reports."""
    from pyspark.sql import functions as F

    from kafkastreamingetl_spark.operators.dedup import contamination_report
    from kafkastreamingetl_spark.operators.text import shingle_hashes

    src, report, index, ckpt = paths
    idx_rows = [
        (1, f"index doc with {PASSAGE} inside"),
        (2, "another index doc beta"),
    ]
    probe_rows = [
        (10, "another index doc beta"),
        (11, f"probe quoting {PASSAGE} here"),
        (12, "clean probe doc"),
    ]
    _docs(spark, idx_rows).write.parquet(src)
    _run(spark, src, report, index, ckpt)
    _docs(spark, probe_rows).write.mode("append").parquet(src)
    _run(spark, src, report, index, ckpt)
    got_stream = sorted(
        tuple(r)
        for r in spark.read.parquet(report)
        .where("batch_id = 1")
        .drop("batch_id")
        .collect()
    )

    def proj(rows):
        text = F.coalesce(F.col("text"), F.lit(""))
        return _docs(spark, rows).select(
            F.col("doc_id"),
            F.md5(text).alias("_h"),
            shingle_hashes(text, 13).alias("_g"),
        )

    idx = proj(idx_rows)
    got_batch = sorted(
        tuple(r)
        for r in contamination_report(
            proj(probe_rows),
            idx.select("_h"),
            idx.select(F.explode("_g").alias("g")),
        ).collect()
    )
    assert got_stream == got_batch


def test_replayed_batch_self_heals(spark, paths):
    """A batch replayed after a crash (fresh checkpoint, same source)
    overwrites its own index/report partitions instead of double-counting
    itself via its previous half-written signatures."""
    src, report, index, ckpt = paths
    _docs(spark, [(1, "solitary document gamma")]).write.parquet(src)
    _run(spark, src, report, index, ckpt)
    # replay batch 0 with a FRESH checkpoint: same batch_id, same rows
    _run(spark, src, report, index, str(paths[3]) + "_replay")
    rep = _report(spark, report)
    # the doc must NOT be flagged against its own earlier half-write
    assert rep[1] == (False, 0, False, 0)
    idx_rows = spark.read.parquet(index + "/hashes").count()
    assert idx_rows == 1  # overwritten, not double-appended


def test_missing_grams_side_bootstraps_not_wedges(spark, paths, tmp_path):
    """ADVICE r13: a crash between the hashes and grams index writes
    leaves hashes/ present, grams/ absent. The next batch must bootstrap
    the gram lane (AnalysisException probe) instead of dying — the exact
    lane still flags the re-crawl off the surviving hashes."""
    import shutil

    src, report, index, ckpt = paths
    _docs(spark, [(1, "original corpus document alpha")]).write.parquet(src)
    _run(spark, src, report, index, ckpt)
    shutil.rmtree(index + "/grams")  # the crash window

    # same source + same checkpoint -> the new files arrive as batch 1,
    # so the strictly-earlier probe reads batch 0's surviving hashes
    _docs(spark, [(10, "original corpus document alpha")]).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, report, index, ckpt)
    rep = _report(spark, report)
    assert rep[10][0] is True and rep[10][2] is True  # exact lane survived
    assert rep[10][1] == 0  # gram lane bootstrapped empty, no collisions
    assert rep[10][3] == 1  # really was a later batch, not a replay
