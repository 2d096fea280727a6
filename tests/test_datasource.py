"""Custom Python DataSource (Spark 4 API): registration, partition-count
invariance, determinism, planted dirtiness, and composability with the
cleaning operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamingetl_spark.datasource import (
    SYNTH_SCHEMA,
    register_synthetic_source,
)


def _read(spark, **opts):
    register_synthetic_source(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_requested_rows_with_schema(spark):
    df = _read(spark, rows=300, partitions=5)
    assert df.count() == 300
    assert df.schema == spark.createDataFrame([], SYNTH_SCHEMA).schema
    # the source parallelizes: one task per requested split
    assert df.rdd.getNumPartitions() == 5


def test_content_invariant_under_partitioning_and_seeded(spark):
    a = sorted(map(tuple, _read(spark, rows=200, partitions=2).collect()))
    b = sorted(map(tuple, _read(spark, rows=200, partitions=7).collect()))
    assert a == b  # rows are a pure function of (seed, index)
    c = sorted(map(tuple, _read(spark, rows=200, seed=99).collect()))
    assert a != c  # the seed re-draws the dataset


def test_planted_dirtiness_present(spark):
    df = _read(spark, rows=500)
    assert df.filter(F.col("event_type").isNull()).count() > 0
    assert df.filter(F.col("value").isNull()).count() > 0
    # duplicate ids exist (every 97th row repeats its predecessor's id)
    assert df.count() > df.select("event_id").distinct().count()


def test_composes_with_cleaning_operator(spark):
    from kafkastreamingetl_spark.operators.cleaning import clean_events

    cleaned = clean_events(_read(spark, rows=400))
    assert cleaned.filter(F.col("event_type_norm").isNull()).count() == 0
    ids = cleaned.select("event_id")
    assert ids.count() == ids.distinct().count()


def test_streaming_reader_resumes_from_checkpoint(spark, tmp_path):
    """readStream over the custom source: each checkpointed availableNow
    run drains the next batch_rows slice, successive runs resume from the
    committed offset (never re-emitting), the union of runs equals the
    batch read of the full range, and a run past max_rows emits nothing."""
    register_synthetic_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        stream = (
            spark.readStream.format("synthetic_events")
            .option("batch_rows", 50)
            .option("max_rows", 150)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(map(tuple, spark.read.parquet(out).collect()))

    totals = [len(run()) for _ in range(3)]
    assert totals == [50, 100, 150]  # each run drains the next slice once
    got = run()  # 4th run: offsets exhausted, nothing new
    assert len(got) == 150
    want = sorted(map(tuple, _read(spark, rows=150).collect()))
    assert got == want


def test_arrow_lane_matches_row_lane(spark):
    """option("arrow", "true") ships partitions as RecordBatches; the data
    must be bit-identical to the per-row tuple lane."""
    rowwise = sorted(map(tuple, _read(spark, rows=250, partitions=3).collect()))
    arrow = sorted(
        map(tuple, _read(spark, rows=250, partitions=3, arrow="true").collect())
    )
    assert rowwise == arrow
