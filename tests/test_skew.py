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
