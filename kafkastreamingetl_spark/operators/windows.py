"""Event-time window aggregation (batch + streaming).

Re-expresses the reference's windowed aggregate (reference
spark/app.py:163-181: A1 sliding-window groupBy with sum / approx-distinct /
max, then window-struct flatten) as a pure transform parameterized by window
size/slide and grouping keys. The same function runs on a batch events table
(DuckDB-oracle checkable) and on a watermarked stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dsum


def windowed_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    keys: list[str] | None = None,
    value_col: str = "value",
    id_col: str = "event_id",
    user_col: str = "user_id",
    approx_distinct: bool = False,
) -> DataFrame:
    """Tumbling (slide=None) or sliding event-time window aggregation.

    Aggregates mirror reference spark/app.py:168-173: total of the metric
    column, distinct-count of the event id (``id_col`` — the reference's
    ``unique_events``, spark/app.py:171), distinct users, max event time,
    and a row count. ``approx_distinct=True`` uses HyperLogLog++
    (``approx_count_distinct``, the reference's streaming-safe choice,
    spark/app.py:171); the exact variant is the DuckDB-oracle-checkable twin
    (SURVEY.md §7.2b). Catalyst plans a partial aggregate before the exchange
    on (window, keys), so the shuffle carries one row per group per input
    partition — this holds at any scale.

    The output flattens the window struct to ``window_start``/``window_end``
    (reference spark/app.py:177-181) so downstream consumers and file sinks
    see flat columns.
    """
    keys = keys or []
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    d = F.approx_count_distinct if approx_distinct else F.countDistinct
    agg = df.groupBy(win.alias("window"), *keys).agg(
        dsum(value_col, "total_value"),
        d(id_col).alias("unique_events"),
        d(user_col).alias("unique_users"),
        F.max(ts_col).alias("max_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        agg.withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
        .select(
            "window_start", "window_end", *keys,
            "total_value", "unique_events", "unique_users", "max_ts", "n_events",
        )
    )


def session_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "2 hours",
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session windows: per-key activity bursts separated by ≥ ``gap``.

    ``F.session_window`` (not in the reference — SURVEY.md §2.8 T2 notes it
    as the natural extension): a session starts at its first event and ends
    ``gap`` after its last; an event joins the session iff it arrives within
    ``gap`` of the previous one. One shuffle on (key), then per-key merge —
    the same cost shape as any keyed aggregation. DuckDB oracle twin: the
    classic gaps-and-islands (lag → new-session flag → running sum id).
    """
    w = F.session_window(ts_col, gap)
    agg = df.groupBy(w.alias("w"), key).agg(
        dsum(value_col, "total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        key,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "total_value",
        "n_events",
    )


def sql_session_agg(
    table: str = "events",
    *,
    ts_col: str = "ts",
    gap_sql: str = "INTERVAL 2 HOUR",
    key: str = "user_id",
    value_col: str = "value",
) -> str:
    """DuckDB gaps-and-islands twin of :func:`session_agg`.

    New-session predicate is ``diff >= gap`` to match Spark exactly: a
    session's window ends ``gap`` after its last event, and an event at
    precisely the boundary starts a NEW session.
    """
    from ..functions import sql_dsum

    return f"""
    WITH marked AS (
        SELECT {key}, {ts_col}, {value_col},
               CASE WHEN LAG({ts_col}) OVER w IS NULL
                      OR {ts_col} - LAG({ts_col}) OVER w >= {gap_sql}
                    THEN 1 ELSE 0 END AS is_new
        FROM {table}
        WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col} ASC NULLS FIRST)
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY {key} ORDER BY {ts_col} ASC NULLS FIRST
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS sid
        FROM marked
    )
    SELECT {key},
           MIN({ts_col}) AS session_start,
           MAX({ts_col}) + {gap_sql} AS session_end,
           {sql_dsum(value_col)} AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY {key}, sid
    """


def streaming_session_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "30 seconds",
    gap: str = "5 minutes",
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming session windows: watermark bounds how long an open session
    can wait for its next event before the state store finalizes it."""
    return session_agg(
        df.withWatermark(ts_col, watermark),
        ts_col=ts_col,
        gap=gap,
        key=key,
        value_col=value_col,
    )


def streaming_windowed_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "30 seconds",
    window: str = "1 minute",
    slide: str | None = "30 seconds",
    keys: list[str] | None = None,
    value_col: str = "value",
    id_col: str = "event_id",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming twin: watermark (T1) + window (T2) + HLL distinct.

    Append-mode sinks emit each window once the watermark passes its end
    (reference semantics, spark/app.py:160-197). Distinct counting must be
    approximate in streaming append mode (SURVEY.md §2.4 note).
    """
    return windowed_agg(
        df.withWatermark(ts_col, watermark),
        ts_col=ts_col,
        window=window,
        slide=slide,
        keys=keys,
        value_col=value_col,
        id_col=id_col,
        user_col=user_col,
        approx_distinct=True,
    )
