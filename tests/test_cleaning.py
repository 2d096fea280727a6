"""Dirty-data cleaning tests (SURVEY.md §5.3): the synthetic generator
reproduces the reference producer's mess (nulls, messy casing, duplicate
ids — producer/producer.py:19-44) and the cleaning stage must fix all of it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.cleaning import clean_events, dedup_deterministic
from kafkastreamingetl_spark.sources import EVENT_TYPES, synthetic_events_batch

N = 5_000


def _dirty(spark):
    return synthetic_events_batch(spark, N, seed=7)


def test_generator_is_deterministic(spark):
    a = _dirty(spark).orderBy("event_id", "ts", "value").collect()
    b = _dirty(spark).orderBy("event_id", "ts", "value").collect()
    assert a == b


def test_generator_is_dirty(spark):
    df = _dirty(spark)
    n = df.count()
    assert n == N
    n_null_value = df.filter(F.col("value").isNull()).count()
    assert 0.05 * N < n_null_value < 0.15 * N  # ~10% null metric
    n_messy = df.filter(F.col("event_type") != F.lower(F.trim("event_type"))).count()
    assert n_messy > 0.5 * N  # most casings are messy variants
    n_null_type = df.filter(F.col("event_type").isNull()).count()
    assert 0.10 * N < n_null_type < 0.25 * N  # ~1/6 null categorical
    n_dup = n - df.select("event_id").distinct().count()
    assert 0.02 * N < n_dup < 0.08 * N  # ~5% duplicate ids


def test_clean_events_fixes_everything(spark):
    cleaned = clean_events(_dirty(spark))
    assert cleaned.filter(F.col("value").isNull()).count() == 0
    assert cleaned.filter(F.col("event_type_norm").isNull()).count() == 0
    # normalized: trimmed, lowercased, member of the canonical vocabulary
    # (+ 'unknown' — null event types map there, and the generator now
    # actually produces them, so the branch is exercised end-to-end)
    bad = cleaned.filter(
        ~F.col("event_type_norm").isin(*EVENT_TYPES, "unknown")
    ).count()
    assert bad == 0
    assert cleaned.filter(F.col("event_type_norm") == "unknown").count() > 0
    # one row per key
    assert cleaned.count() == cleaned.select("event_id").distinct().count()


@pytest.mark.parametrize("seed", [7, 11, 42])
def test_generator_to_clean_pipeline_invariants(spark, seed):
    """Generator → clean_events invariants hold at any seed: unique keys,
    zero nulls in filled columns, canonical (trim+lower fixpoint) types."""
    cleaned = clean_events(synthetic_events_batch(spark, 2_000, seed=seed))
    pdf = cleaned.toPandas()
    assert pdf.event_id.is_unique
    assert pdf.value.notna().all()
    assert pdf.event_type_norm.notna().all()
    assert (
        pdf.event_type_norm == pdf.event_type_norm.str.strip().str.lower()
    ).all()


def test_dedup_deterministic_picks_by_order(spark):
    rows = [(1, 10.0, "b"), (1, 5.0, "a"), (2, 1.0, "c")]
    df = spark.createDataFrame(rows, ["k", "v", "tag"])
    out = dedup_deterministic(df, ["k"], [F.asc("v")]).orderBy("k").collect()
    assert [(r.k, r.tag) for r in out] == [(1, "a"), (2, "c")]


def test_clean_events_survivor_total_order(spark):
    """Duplicate keys tying on (ts, value) must still yield a deterministic
    survivor via the full-column tiebreaker — same answer regardless of
    input order or partitioning."""
    base = [
        (1, "2024-01-01 00:00:00", 7, "zz", 5.0, "{}"),
        (1, "2024-01-01 00:00:00", 3, "aa", 5.0, "{}"),  # ties on ts+value
    ]
    for perm in (base, base[::-1]):
        df = spark.createDataFrame(
            perm,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts")).repartition(8)
        out = clean_events(df).collect()
        assert len(out) == 1
        assert out[0].user_id == 3  # min user_id breaks the tie, always
