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


def daily_aggregate(
    events: DataFrame,
    customer: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    approx_distinct: bool = False,
) -> DataFrame:
    """A2: per-(date, event_type, segment) revenue + distinct-event count.

    The shared core of :func:`daily_segment_metrics` and
    :func:`premium_rollup` (reference kafka_spark_etl.py:64-70). Factored out
    so the premium rollup never pays for the rank's window sort it would
    immediately discard. The user dim join is left unhinted — customer is a
    scale-proportional table, not a fixed dim; AQE broadcasts it when (and
    only when) its runtime size is under threshold.

    ``approx_distinct=True`` swaps exact ``countDistinct`` (the oracle twin)
    for ``approx_count_distinct`` (HyperLogLog++, the reference's own choice
    at spark/app.py:171) — at 100 TB the exact distinct's expand+shuffle on
    (group keys × event_id) is the dominant cost; production callers should
    prefer the approximate path.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    d = F.approx_count_distinct if approx_distinct else F.countDistinct
    enriched = with_event_date(events, ts_col).join(dim, "user_id", "left")
    return enriched.groupBy("event_date", "event_type", "segment").agg(
        dsum(value_col, "daily_revenue"),
        d("event_id").alias("daily_events"),
    )


def daily_segment_metrics(
    events: DataFrame,
    customer: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """A2 + W1: daily aggregate plus in-group revenue rank.

    row_number by revenue within (event_date, event_type), with a segment
    tiebreaker so results are deterministic under ties (SURVEY.md §7.2d).
    """
    daily = daily_aggregate(events, customer, ts_col=ts_col, value_col=value_col)
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
    daily = daily_aggregate(events, customer, ts_col=ts_col, value_col=value_col)
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
