"""Exact distributed ntile (operators/rankstats) — semantics equal to
``F.ntile`` bit-for-bit, execution without a single-partition global sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.rankstats import with_exact_ntile


def _reference_ntile(df, n, cols):
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in cols])
    return df.withColumn("bucket", F.ntile(n).over(w).cast("int"))


@pytest.mark.parametrize(
    ("rows", "n"),
    [
        (97, 10),   # N % n != 0: first N%n buckets one row larger
        (100, 10),  # even split
        (7, 10),    # N < n: every row its own bucket 1..N
        (1, 10),
        (33, 4),
        (1000, 32),
    ],
)
def test_exact_ntile_matches_window_ntile(spark, rows, n):
    df = spark.range(rows).select(
        (F.col("id") * 37 % 53).alias("v"), F.col("id").alias("uid")
    )
    expected = _reference_ntile(df, n, ["v", "uid"])
    got = with_exact_ntile(df, n, ["v", "uid"])
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_exact_ntile_null_leading_values_bucket_first(spark):
    df = spark.range(40).select(
        F.when(F.col("id") < 5, None).otherwise(F.col("id")).alias("v"),
        F.col("id").alias("uid"),
    )
    expected = _reference_ntile(df, 4, ["v", "uid"])
    got = with_exact_ntile(df, 4, ["v", "uid"])
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_exact_ntile_heavy_tie_on_leading_key(spark):
    # one value carries half the frame: range buckets degrade to skew,
    # the ANSWER must not (ties broken by uid exactly like the window)
    df = spark.range(200).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id")).alias("v"),
        F.col("id").alias("uid"),
    )
    expected = _reference_ntile(df, 10, ["v", "uid"])
    got = with_exact_ntile(df, 10, ["v", "uid"])
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_exact_ntile_bit_equal_across_widths(spark):
    """Bucket assignment is exchange-width-independent: explicit widths 1,
    32, 200 and the session-derived default (the shuffle width at call
    time) all produce the identical frame — width sets balance, never the
    answer."""
    df = spark.range(997).select(
        (F.col("id") * 37 % 53).alias("v"), F.col("id").alias("uid")
    )
    base = sorted(
        with_exact_ntile(df, 10, ["v", "uid"], num_partitions=1).collect()
    )
    for width in (32, 200, None):
        got = sorted(
            with_exact_ntile(
                df, 10, ["v", "uid"], num_partitions=width
            ).collect()
        )
        assert got == base, f"width={width}"


def test_exact_ntile_default_width_tracks_session(spark):
    """The default cut width is read from the session's
    spark.sql.shuffle.partitions at call time, not hardcoded. (The
    PHYSICAL partition count of the output is AQE's business since the
    r16 deterministic-bounds redesign — the semantic width shows up as
    the number of quantile bounds the cut derives.)"""
    from kafkastreamingetl_spark.operators import rankstats

    df = spark.range(50).select(
        F.col("id").alias("v"), F.col("id").alias("uid")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        ranked = with_exact_ntile(df, 5, ["v", "uid"])
        assert rankstats.last_width == 7
        # and the answer is still exact at that width
        expected = _reference_ntile(df, 5, ["v", "uid"])
        assert expected.exceptAll(ranked).count() == 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_exact_ntile_rejects_helper_column_collisions(spark):
    df = spark.range(3).select(F.col("id").alias("_rn"), "id")
    with pytest.raises(ValueError):
        with_exact_ntile(df, 2, ["id"])


def test_exact_ntile_plan_has_no_window_operator_at_all(spark):
    """Single-cut (checkpoint) strategy: the physical plan contains NO
    window operator — the data-sized sort is a range exchange +
    in-partition sorts, the offsets come from a P×P broadcast self-join.
    An empty-partition windowspec anywhere would be the single-task
    funnel (and would emit Spark's 'No Partition Defined' warning in the
    driver's bench tail)."""
    df = spark.range(500).select(
        (F.col("id") % 97).alias("v"), F.col("id").alias("uid")
    )
    got = with_exact_ntile(df, 10, ["v", "uid"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan
    assert "ntile" not in plan.lower()


def test_exact_ntile_cuts_matches_window_ntile_and_plan_is_linear(spark):
    """Multi-cut (deterministic-bounds) strategy: bit-equal to three
    chained window ntiles; every window spec in the plan is PARTITIONED
    (by the deterministic range-bound _pid) and there is no checkpoint
    barrier (no ExistingRDD scan) and no broadcast offsets join — the
    offsets are literals."""
    from test_plan_shapes import _unpartitioned_window_specs

    from kafkastreamingetl_spark.operators.rankstats import exact_ntile_cuts

    df = spark.range(997).select(
        (F.col("id") * 37 % 53).alias("v"),
        (F.col("id") * 11 % 17).alias("w"),
        F.col("id").alias("uid"),
    )
    got = exact_ntile_cuts(
        df, [(10, ["v", "uid"], "bv"), (4, ["w", "uid"], "bw")]
    )
    expected = df
    for n, cols, name in ((10, ["v", "uid"], "bv"), (4, ["w", "uid"], "bw")):
        w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in cols])
        expected = expected.withColumn(name, F.ntile(n).over(w).cast("int"))
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert not _unpartitioned_window_specs(plan)
    assert "ntile" not in plan.lower()
    assert "ExistingRDD" not in plan


def test_registered_decile_and_zorder_lanes_use_rankstats(spark, sf_dir):
    """The two single-cut queries VERDICT r6 flagged as scale-weak route
    through with_exact_ntile (checkpoint strategy): no window operator
    anywhere — the checkpointed rank frame shows as an ExistingRDD scan
    joined to a broadcast offsets side. The multi-cut RFM lane rides
    exact_ntile_cuts: partitioned windows only, no checkpoint barrier."""
    from test_plan_shapes import _unpartitioned_window_specs

    from kafkastreamingetl_spark.queries import QUERIES

    for name in ("user_ltv_deciles", "events_zorder_layout"):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition" not in plan, name
        assert "ntile" not in plan.lower(), name
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, name
    rfm = QUERIES["user_rfm_segments"](spark, sf_dir)
    plan = rfm._jdf.queryExecution().executedPlan().toString()
    assert not _unpartitioned_window_specs(plan)
    assert "ntile" not in plan.lower()
    assert "ExistingRDD" not in plan


def test_rfm_segments_match_window_ntile_differential(spark, sf_dir):
    """The registered RFM query (three exact-ntile cuts) must equal the
    same census computed with Spark's own global-window ntile."""
    from pyspark.sql import functions as F

    from kafkastreamingetl_spark.catalog import load_events
    from kafkastreamingetl_spark.functions import dsum
    from kafkastreamingetl_spark.queries import QUERIES

    got = QUERIES["user_rfm_segments"](spark, sf_dir)
    ev = load_events(spark, sf_dir).filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "ltv"),
    )

    def cut(metric, name):
        w = Window.orderBy(
            F.col(metric).asc_nulls_first(), F.col("user_id").asc_nulls_first()
        )
        return F.ntile(4).over(w).cast("int").alias(name)

    expected = (
        u.select(
            "user_id",
            "ltv",
            cut("last_us", "r_bucket"),
            cut("n_events", "f_bucket"),
            cut("ltv", "m_bucket"),
        )
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"), dsum("ltv", "total_ltv"))
    )
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0
