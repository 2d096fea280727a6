"""Edge cases: empty inputs, degenerate parameters, null keys — the P8
family applied across the operator surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkastreamingetl_spark.operators.cleaning import clean_events
from kafkastreamingetl_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    neardup_pairs,
)
from kafkastreamingetl_spark.operators.rollup import daily_segment_metrics
from kafkastreamingetl_spark.operators.similarity import cosine_topk, self_queries
from kafkastreamingetl_spark.operators.windows import session_agg, windowed_agg
from kafkastreamingetl_spark.sources import EVENT_SCHEMA


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame([], schema=EVENT_SCHEMA)


def test_empty_events_through_batch_operators(spark, empty_events):
    customer = spark.createDataFrame(
        [(1, "SEG", 0.0)], ["c_custkey", "c_mktsegment", "c_acctbal"]
    )
    assert clean_events(empty_events).count() == 0
    assert windowed_agg(empty_events, keys=["event_type"]).count() == 0
    assert session_agg(empty_events).count() == 0
    assert daily_segment_metrics(empty_events, customer).count() == 0


def test_empty_documents_through_dedup(spark):
    docs = spark.createDataFrame(
        [], schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
    )
    assert exact_dedup(docs).count() == 0
    assert lsh_candidate_pairs(docs).count() == 0
    assert neardup_pairs(docs).count() == 0


def test_topk_with_k_larger_than_corpus(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], i) for i in range(3)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        ),
    )
    got = cosine_topk(emb, self_queries(emb, 1), k=100).collect()
    assert len(got) == 2  # corpus minus self, not k
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == [1, 2]


def test_null_event_type_normalizes(spark):
    rows = [(1, "2024-01-01 00:00:00", 1, None, None, None)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = clean_events(df).collect()[0]
    assert out.event_type_norm == "unknown"
    assert out.value == 0.0


def test_all_duplicate_corpus(spark):
    docs = spark.createDataFrame(
        [(i, "same exact words repeated here okay") for i in range(10)],
        ["doc_id", "text"],
    )
    survivors = exact_dedup(docs).collect()
    assert [r.doc_id for r in survivors] == [0]
    # identical docs share every band: all 45 pairs are candidates with
    # jaccard exactly 1.0
    pairs = neardup_pairs(docs).collect()
    assert len(pairs) == 45
    assert all(r.jaccard == 1.0 for r in pairs)
