"""The daily batch rollup — the reference's Airflow/pandas stage as Spark.

Re-expresses the eager single-node pandas pipeline (reference
airflow/dags/kafka_spark_etl.py:31-109 — X2: S6 scan, P4 day filter, A2
daily agg, W1 rank, P7 dim dedup, J3 segment join, A3 premium rollup, S7
write) as one lazy Spark query, which is what makes it survive 100 TB: the
pandas stage materialized the whole lake in one process's memory
(kafka_spark_etl.py:47), whereas this plan scans parquet with pushed-down
date predicates and column pruning, aggregates with map-side partials, and
only shuffles group keys.

Semantics notes carried over from SURVEY.md §7.2d:
- the pandas rank (sort + cumcount + 1, kafka_spark_etl.py:73-78) is
  ``row_number`` — ties get distinct consecutive ranks — so we use
  ``row_number`` with a deterministic tiebreaker, not ``rank``.
- the pandas dim-dedup-then-join (kafka_spark_etl.py:93-94) keeps an
  arbitrary row per segment; we make it deterministic by aggregating the
  premium flag per segment (``max``), which matches the reference's data
  (its dim was functionally 1:1) without its nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dsum

PREMIUM_BALANCE_THRESHOLD = 5000.0


def with_event_date(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """F5/F7: timestamp -> date (reference spark/app.py:179,
    kafka_spark_etl.py:54)."""
    return df.withColumn("event_date", F.to_date(F.col(ts_col)))


def daily_segment_metrics(
    events: DataFrame,
    customer: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """A2 + W1: per-(date, event_type, segment) revenue with in-group rank.

    events ⋈ broadcast(customer-as-user-dim) -> date rollup -> row_number
    rank by revenue within (event_date, event_type). The rank's orderBy has
    a segment tiebreaker so results are deterministic under ties
    (SURVEY.md §7.2d).
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal") > F.lit(PREMIUM_BALANCE_THRESHOLD)).alias("is_premium"),
    )
    enriched = with_event_date(events, ts_col).join(F.broadcast(dim), "user_id", "left")
    daily = enriched.groupBy("event_date", "event_type", "segment").agg(
        dsum(value_col, "daily_revenue"),
        F.countDistinct("event_id").alias("daily_events"),
    )
    w = Window.partitionBy("event_date", "event_type").orderBy(
        F.desc("daily_revenue"), F.asc("segment")
    )
    return daily.withColumn("revenue_rank_in_type", F.row_number().over(w))


def premium_rollup(
    events: DataFrame,
    customer: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """P7 + J3 + A3: segment-dim dedup-join then premium-level rollup
    (reference kafka_spark_etl.py:81-100).

    The per-segment premium flag is derived with a deterministic aggregate
    (max over the segment) replacing the reference's order-dependent
    ``drop_duplicates`` pick.
    """
    daily = daily_segment_metrics(events, customer, ts_col=ts_col, value_col=value_col)
    seg_dim = (
        customer.select(
            F.col("c_mktsegment").alias("segment"),
            (F.col("c_acctbal") > F.lit(PREMIUM_BALANCE_THRESHOLD)).alias("is_premium"),
        )
        .groupBy("segment")
        .agg(F.max("is_premium").alias("segment_is_premium"))
    )
    joined = daily.join(F.broadcast(seg_dim), "segment", "left")
    return (
        joined.groupBy("event_date", "event_type", "segment_is_premium")
        .agg(
            dsum("daily_revenue", "total_revenue"),
            F.sum("daily_events").alias("total_events"),
        )
    )
