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


def test_empty_documents_through_round6_operators(spark):
    """Empty corpus: packing, dup-rate, weighted sampling, vocab counts,
    contamination, and incremental dedup all yield empty results (never
    crash) — and k-means on a corpus with no seed ids degrades to an
    empty model and empty stats."""
    from kafkastreamingetl_spark.operators.corpus import (
        dedup_rate_by_source,
        pack_token_bins,
        quality_weighted_sample,
    )
    from kafkastreamingetl_spark.operators.dedup import (
        eval_contamination,
        incremental_exact_dedup,
    )
    from kafkastreamingetl_spark.operators.similarity import (
        fit_kmeans,
        kmeans_centroid_stats,
    )
    from kafkastreamingetl_spark.operators.text import vocab_token_counts

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert pack_token_bins(empty).count() == 0
    assert dedup_rate_by_source(empty).count() == 0
    assert quality_weighted_sample(empty).count() == 0
    assert vocab_token_counts(empty).count() == 0
    assert eval_contamination(empty, empty).count() == 0
    assert incremental_exact_dedup(empty, empty).count() == 0

    emb_empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert fit_kmeans(emb_empty) == []
    assert kmeans_centroid_stats(emb_empty).count() == 0


def test_kmeans_fewer_vectors_than_k(spark):
    """A corpus smaller than k trains a model with one cluster per vector
    (seeds are whichever of ids 0..k-1 exist) rather than failing."""
    from kafkastreamingetl_spark.operators.similarity import fit_kmeans

    df = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [2.0] * 64)], "vec_id long, embedding array<double>"
    )
    model = fit_kmeans(df, k=8, n_iter=1)
    assert [cl for cl, _ in model] == [0, 1]
