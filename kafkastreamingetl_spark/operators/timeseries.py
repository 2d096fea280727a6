"""Time-series reshaping: gap-filled (dense) daily series per key.

Aggregated event data is sparse — a (key, day) with no events simply has no
row — but downstream consumers (forecasting models, charting, day-over-day
ratios) need a DENSE grid: every key × every day in the observed span,
missing days filled explicitly. This operator produces that grid
relationally (no driver-side date arithmetic, no collect):

- the day spine comes from one global min/max aggregate exploded through
  ``sequence`` — a 1-row cross join, broadcast by AQE;
- additive metrics (revenue, counts) fill with ZERO on missing days (no
  events means no revenue — carrying yesterday's sum forward would be
  wrong);
- state-like metrics (the day's closing event value) FORWARD-FILL via
  ``last(..., ignorenulls=True)`` over a day-ordered window — the last
  known state persists through quiet days, the daily-closing-price
  semantics;
- ``is_observed`` marks real vs filled rows so consumers can tell data
  from imputation.

Scale shape: the heavy input collapses to one (key, day) row per group
map-side before anything else; the grid is |keys| × |days| — tiny relative
to events; the forward-fill window sorts days within each key (bounded by
span length, not event count). The reference has nothing like this
(SURVEY §2 has no reshape family); it is the batch complement of the
streaming windowed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum


def daily_dense_series(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, day, revenue, n_events, close, is_observed): the gap-filled
    daily series per key over the full observed span.

    ``close`` is the value of the day's LAST event (ties broken by
    event_id — a total order, so both engines pick the same row),
    forward-filled across missing days and 0.0 before a key's first
    observation; ``revenue``/``n_events`` zero-fill. Null keys are
    excluded (they would form a phantom series)."""
    ev = events.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.to_date(ts_col).alias("day"),
        F.col(ts_col).alias("_ts"),
        "event_id",
        F.col(value_col).alias("_v"),
    )
    last_first = Window.partitionBy("key", "day").orderBy(
        F.col("_ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    daily = (
        ev.withColumn("_rn", F.row_number().over(last_first))
        .groupBy("key", "day")
        .agg(
            dsum("_v", "revenue"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias("_close_raw"),
        )
    )
    bounds = ev.agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    days = bounds.select(
        F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")).alias("day")
    )
    keys = ev.select("key").distinct()
    grid = keys.crossJoin(days)
    ff = Window.partitionBy("key").orderBy(F.col("day").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        grid.join(daily, ["key", "day"], "left")
        .select(
            "key",
            "day",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(
                F.last("_close_raw", ignorenulls=True).over(ff), F.lit(0.0)
            ).alias("close"),
            F.col("_close_raw").isNotNull().alias("is_observed"),
        )
    )


def sql_daily_dense_series(
    table: str = "events",
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    return f"""
    WITH ev AS (
        SELECT {key_col} AS key, CAST({ts_col} AS DATE) AS day,
               {ts_col} AS _ts, event_id, {value_col} AS _v
        FROM {table}
        WHERE {key_col} IS NOT NULL
    ),
    daily AS (
        SELECT key, day,
               {sql_dsum('_v')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(CASE WHEN _rn = 1 THEN _v END) AS _close_raw
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY key, day
                ORDER BY _ts DESC NULLS LAST, event_id DESC NULLS LAST
            ) AS _rn
            FROM ev
        )
        GROUP BY 1, 2
    ),
    b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
    days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM b
    ),
    grid AS (SELECT k.key, days.day FROM (SELECT DISTINCT key FROM ev) k
             CROSS JOIN days)
    SELECT g.key, g.day,
           COALESCE(d.revenue, 0.0) AS revenue,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(last_value(d._close_raw IGNORE NULLS) OVER (
               PARTITION BY g.key ORDER BY g.day ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS close,
           d._close_raw IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN daily d ON g.key = d.key AND g.day = d.day
    """
