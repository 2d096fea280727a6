"""Kafka runtime smoke test — env-var opt-in, skipped where no broker.

The construct-only trio (S1 kafka_source, S8 write_kafka_stream /
batch producer path, T7 offset replay) mirrors the reference's option
strings (reference spark/app.py:53-59, producer/producer.py:48-51) but
cannot execute in a sandbox with no broker and no spark-sql-kafka
connector jar. This module makes that gap *visible and closable*: the
moment an environment provides both, set

    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092

and the round-trip runs for real. Until then it reports SKIPPED (not
absent), so the untested surface stays on the scoreboard.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.sources import (
    decode_json_events,
    kafka_source,
    synthetic_events_batch,
)
from kafkastreamingetl_spark.streaming import run_available_now, write_memory_stream

BOOTSTRAP = os.getenv("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason=(
        "Kafka integration is env-opt-in: set SPARK_GRAFT_KAFKA_BOOTSTRAP to a "
        "reachable broker (needs the spark-sql-kafka connector on the classpath)"
    ),
)


def _skip_unless_connector(spark):
    """Probe for the spark-sql-kafka data source; skip (don't fail) if the
    connector jar is not on this session's classpath."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "connector_probe").load()
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source: kafka" in str(e):
            pytest.skip("spark-sql-kafka connector not on classpath")
        raise


def test_kafka_round_trip_and_offset_replay(spark):
    """S8 → S1 → T7: produce the reference wire format to a fresh topic,
    consume with startingOffsets=earliest, then replay from a second
    fresh reader and get the same rows."""
    _skip_unless_connector(spark)
    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
    events = synthetic_events_batch(spark, 200, seed=5)
    n_src = events.count()

    # S8 (batch variant of the producer): to_json(struct(*)) -> value bytes
    payload = events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    )
    (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    # S1: earliest-offset streaming read + envelope decode
    decoded = decode_json_events(kafka_source(spark, BOOTSTRAP, topic))
    run_available_now([write_memory_stream(decoded, "kafka_smoke_1")])
    got = spark.table("kafka_smoke_1")
    assert got.count() == n_src
    assert got.filter(F.col("event_id").isNull()).count() == 0

    # T7: a fresh reader (fresh checkpoint) replays the full topic
    replay = decode_json_events(kafka_source(spark, BOOTSTRAP, topic))
    run_available_now([write_memory_stream(replay, "kafka_smoke_2")])
    assert spark.table("kafka_smoke_2").count() == n_src
