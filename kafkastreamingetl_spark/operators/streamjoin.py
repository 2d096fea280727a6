"""Stream-stream time-interval join (engine extension).

The reference only ever joins its stream against a *static* dim
(reference spark/app.py:82-90); correlating two event streams — e.g.
attributing a purchase to the click that preceded it — has no reference
analogue. Structured Streaming expresses it natively: watermark BOTH legs,
join on an equality key plus a time-range predicate, and the range bound
lets the engine evict per-key state once the watermark passes
``left_ts + horizon`` (SURVEY.md §2.8 stream-stream note).

Scale shape: the equality key makes the physical plan a hash-partitioned
StreamingSymmetricHashJoin — each side shuffles ON THE KEY exactly once,
state lives per key in RocksDB (off-heap, set in session.get_spark), and
the time bound keeps state size ~(arrival rate × (watermark + horizon))
regardless of total history. Without the equality key Spark would fall
back to a broadcast-nested-loop over unbounded state — the batch twin
below asserts the keyed shape instead.

The pair producer is engine-agnostic (same expressions batch or
streaming); the batch form is the oracle twin the driver checks, the
streaming form is differentially tested against it in
tests/test_streamjoin.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dsum, normalize_string, sql_dsum


def split_typed_legs(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """Split one event lineage into two typed legs with disjoint column
    names (self-join hygiene: renaming beats ``df["col"]`` disambiguation,
    and works identically for batch and streaming inputs)."""
    norm = normalize_string(type_col)
    left = events.where(norm == left_type).select(
        F.col("user_id"),
        F.col(ts_col).alias(f"{left_type}_ts"),
    )
    right = events.where(norm == right_type).select(
        F.col("user_id").alias("r_user_id"),
        F.col(ts_col).alias(f"{right_type}_ts"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias(f"{right_type}_value"),
    )
    return left, right


def interval_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    horizon: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with the same user and ``right_ts`` in
    ``(left_ts, left_ts + horizon]`` — half-open so an event never
    attributes to a simultaneous one.

    The condition is equality-on-key AND range-on-time; Catalyst plans the
    equality as the join key (hash/SMJ in batch, symmetric-hash in
    streaming) and the range as a residual filter — never a theta-join.

    ``how="left_outer"`` (streaming): an unmatched left row is held in
    state and emitted null-extended only once the watermark passes
    ``left_ts + horizon`` — i.e. when a match has become impossible. The
    emission is therefore a *later micro-batch* than the one that read the
    row (asserted in tests/test_streamjoin.py); batch mode gives the same
    rows immediately.
    """
    cond = (
        (left["user_id"] == right["r_user_id"])
        & (right[right_ts] > left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return left.join(right, cond, how).drop("r_user_id")


def attribution_rollup(pairs: DataFrame, value_col: str = "purchase_value") -> DataFrame:
    """Per-user attribution totals over the pair stream/frame."""
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("attributed_pairs"),
            dsum(value_col, "attributed_value"),
        )
        .orderBy("user_id")
    )


def purchase_attribution(events: DataFrame, *, horizon: str = "10 minutes") -> DataFrame:
    """Batch twin: clicks ⋈ purchases within ``horizon``, rolled up per
    user. This exact plan is the driver-checked oracle twin of the
    streaming join below."""
    clicks, purchases = split_typed_legs(events)
    pairs = interval_pairs(
        clicks, purchases, left_ts="click_ts", right_ts="purchase_ts", horizon=horizon
    )
    return attribution_rollup(pairs)


def purchase_attribution_pairs_streaming(
    events_stream: DataFrame,
    *,
    horizon: str = "10 minutes",
    watermark: str = "30 seconds",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Streaming stream-stream join: watermark the lineage once (both legs
    inherit it), split, interval-join. Emits each (click, purchase) pair as
    soon as both sides arrive (append mode); state for a click is evicted
    once the watermark passes ``click_ts + horizon``. With
    ``how="left_outer"``, evicted-unmatched clicks emit null-extended at
    that same point — the funnel's "clicked, never purchased" stream."""
    wm = events_stream.withWatermark(ts_col, watermark)
    clicks, purchases = split_typed_legs(wm)
    return interval_pairs(
        clicks,
        purchases,
        left_ts="click_ts",
        right_ts="purchase_ts",
        horizon=horizon,
        how=how,
    )


def sql_purchase_attribution(horizon_sql: str = "INTERVAL 10 MINUTE") -> str:
    """DuckDB oracle for :func:`purchase_attribution`."""
    return f"""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts
        FROM events
        WHERE coalesce(lower(trim(event_type)), 'unknown') = 'click'
    ),
    purchases AS (
        SELECT user_id, ts AS purchase_ts,
               coalesce(value, 0.0) AS purchase_value
        FROM events
        WHERE coalesce(lower(trim(event_type)), 'unknown') = 'purchase'
    )
    SELECT c.user_id,
           COUNT(*) AS attributed_pairs,
           {sql_dsum('p.purchase_value')} AS attributed_value
    FROM clicks c
    JOIN purchases p
      ON c.user_id = p.user_id
     AND p.purchase_ts > c.click_ts
     AND p.purchase_ts <= c.click_ts + {horizon_sql}
    GROUP BY c.user_id
    ORDER BY c.user_id
    """
