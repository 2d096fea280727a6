"""Streaming Misra-Gries heavy hitters: bounded state (n_groups summaries,
never the vocabulary), the all-time superset guarantee across micro-batches
and across restarts (state restored from the checkpoint), and per-group
running totals that account for every token seen.
"""

from __future__ import annotations

from collections import Counter

import pytest

from kafkastreamingetl_spark.operators.corpus import frequent_tokens_stream
from kafkastreamingetl_spark.streaming import run_available_now

CAP = 6
GROUPS = 4


def _write_docs(spark, rows, src, mode="append"):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        mode
    ).parquet(src)


def _run(spark, src, ckpt, out_dir):
    """foreachBatch -> parquet append (memory sink cannot recover from a
    checkpoint, and cross-run state restore is exactly what's under
    test); emissions carry the batch id for last-emission selection."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = frequent_tokens_stream(stream, capacity=CAP, n_groups=GROUPS)

    def write(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(write)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    run_available_now([q])
    return spark.read.parquet(out_dir).toPandas()


def _latest_summaries(emissions):
    """Per group, the LAST emission (update mode re-emits the whole
    summary each batch; grp_total grows monotonically, so max marks it)."""
    latest: dict[int, dict] = {}
    for grp, g in emissions.groupby("grp"):
        top = g[g["grp_total"] == g["grp_total"].max()]
        latest[grp] = dict(zip(top["token"], top["weight"]))
    return latest


@pytest.fixture()
def paths(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )


def test_stream_superset_and_bounded_state(spark, paths):
    import random

    src, ckpt, out = paths
    rng = random.Random(17)
    vocab = ["hot1", "hot2"] * 10 + [f"cold{i}" for i in range(40)]
    texts1 = [" ".join(rng.choices(vocab, k=20)) for _ in range(30)]
    texts2 = [" ".join(rng.choices(vocab, k=20)) for _ in range(30)]

    _write_docs(spark, list(enumerate(texts1)), src, mode="overwrite")
    _run(spark, src, ckpt, out)

    # second wave through the SAME checkpoint: state must carry over
    _write_docs(spark, list(enumerate(texts2, start=100)), src)
    emissions = _run(spark, src, ckpt, out)

    summaries = _latest_summaries(emissions)
    # bounded state: each group's summary holds <= capacity entries
    for grp, summary in summaries.items():
        assert len(summary) <= CAP, (grp, len(summary))
    # totals account for every token seen across BOTH waves
    all_tokens = [t for s in texts1 + texts2 for t in s.split(" ")]
    assert sum(
        int(emissions[emissions["grp"] == g]["grp_total"].max())
        for g in summaries
    ) == len(all_tokens)
    # all-time superset guarantee: every global heavy hitter survives
    survivors = {t for s in summaries.values() for t in s}
    n = len(all_tokens)
    for tok, cnt in Counter(all_tokens).items():
        if cnt * (CAP + 1) > n:
            assert tok in survivors, (tok, cnt)


def test_stream_groups_partition_tokens(spark, paths):
    """A token only ever appears under one group id (hash grouping keeps
    each token's whole substream in one summary — the property the
    superset argument needs)."""
    src, ckpt, out = paths
    _write_docs(
        spark,
        [(1, "a b c d e f g h"), (2, "a b c x y z w v")],
        src,
        mode="overwrite",
    )
    emissions = _run(spark, src, ckpt, out)
    per_token = emissions.groupby("token")["grp"].nunique()
    assert (per_token == 1).all()
