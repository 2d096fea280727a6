"""Salted aggregation: identical results to direct groupBy on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.functions import dsum
from kafkastreamingetl_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key; every 13th metric is null (count
    # semantics must match SQL COUNT(col)); magnitudes reach ~1e12 so a
    # double round-trip between the salt phases would lose decimals
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.when(F.col("id") % 13 == 0, F.lit(None).cast("double")).otherwise(
            (F.col("id") % 97).cast("double") * 1.23456e10
        ).alias("v"),
    )


def test_salted_agg_matches_direct(spark, skewed):
    direct = skewed.groupBy("k").agg(
        dsum("v", "total"),
        F.count("v").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
    )
    assert sorted(direct.collect()) == sorted(salted.collect())


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(skewed, ["k"], {"d": ("count_distinct", "v")})


@pytest.fixture(scope="module")
def dim(spark):
    # 40 keys; fact side (``skewed_ids``) hits only half of them, and key 7
    # is hot — the shape salted_shuffle_join exists for
    return spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("attr")
    )


@pytest.fixture(scope="module")
def skewed_ids(spark):
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 20).alias("k"),
        F.col("id").alias("row_id"),
    )


def test_salted_shuffle_join_matches_plain(spark, skewed_ids, dim):
    from kafkastreamingetl_spark.operators.skew import salted_shuffle_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real shuffle join so the salt path is actually exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = skewed_ids.join(dim, "k").select("row_id", "k", "attr")
        salted = salted_shuffle_join(skewed_ids, dim, "k", n_salts=4).select(
            "row_id", "k", "attr"
        )
        assert sorted(plain.collect()) == sorted(salted.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_shuffle_join_left_keeps_unmatched(spark, skewed_ids, dim):
    from kafkastreamingetl_spark.operators.skew import salted_shuffle_join

    # keys 20..39 exist only in the dim; fact keys 10..19 have no dim row
    fact = skewed_ids.filter(F.col("k") >= 10)
    plain = fact.join(dim.filter(F.col("k") < 10), "k", "left")
    salted = salted_shuffle_join(
        fact, dim.filter(F.col("k") < 10), "k", n_salts=4, how="left"
    )
    assert sorted(r.asDict().items() for r in plain.collect()) == sorted(
        r.asDict().items() for r in salted.collect()
    )
    assert salted.filter(F.col("attr").isNull()).count() == fact.count()


def test_salted_shuffle_join_partitions_on_salt(spark, skewed_ids, dim):
    from kafkastreamingetl_spark.operators.skew import salted_shuffle_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            salted_shuffle_join(skewed_ids, dim, "k", n_salts=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "_salt" in plan and "hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_key_skew_profile_hand_computed(spark):
    from kafkastreamingetl_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] + [("c",)] + [(None,)] * 2, "k string"
    )
    [r] = key_skew_profile(df, "k").collect()
    assert (r.n_rows, r.n_keys, r.max_key_rows, r.null_rows) == (6, 3, 4, 2)
    assert r.skew_ratio == 4 * 3 / 6
    assert r.top_share == 4 / 6
    assert r.hhi == (16 + 1 + 1) / 36


def test_key_skew_profile_uniform_is_flat(spark):
    from kafkastreamingetl_spark.operators.skew import key_skew_profile

    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    [r] = key_skew_profile(df, "k").collect()
    assert r.skew_ratio == 1.0
    assert r.hhi == 1 / 10
    assert r.null_rows == 0
