"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a DuckDB-oracle SQL twin.

Conventions keeping the two engines hash-identical:
- every computed column is aliased the same on both sides;
- float SUM/AVG go through DECIMAL(18,4) (order-independent — see
  functions.dsum / functions.sql_dsum);
- every window ORDER BY carries explicit NULLS FIRST/LAST matching Spark's
  defaults (ASC -> NULLS FIRST, DESC -> NULLS LAST);
- DuckDB BIGINT/INT casts match Spark output types (e.g. row_number is int
  in Spark, bigint in DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions import sql_dsum
from .operators.cleaning import clean_events
from .operators.enrichment import enrich_events
from .operators.rollup import daily_segment_metrics, premium_rollup
from .operators.windows import windowed_agg

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable and its oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# Reference surface: cleaning / enrichment / windows / rollup
# ===========================================================================


@query(
    "clean_events",
    oracle="""
    SELECT event_id, ts, user_id,
           coalesce(lower(trim(event_type)), 'unknown') AS event_type_norm,
           coalesce(value, 0.0) AS value
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_id
        ORDER BY ts ASC NULLS FIRST, coalesce(value, 0.0) ASC NULLS FIRST
    ) = 1
    """,
)
def q_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P5/P6/U1 — reference spark/app.py:66-80 re-expressed built-in."""
    df = clean_events(_t(spark, sf_dir, "events"))
    return df.select("event_id", "ts", "user_id", "event_type_norm", "value")


@query(
    "windowed_agg_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           {sql_dsum('value')} AS total_value,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS unique_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
           MAX(ts) AS max_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_windowed_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/T2 (tumbling; exact-distinct oracle twin) — reference
    spark/app.py:163-181."""
    return windowed_agg(
        _t(spark, sf_dir, "events"), window="1 hour", keys=["event_type"]
    )


@query(
    "windowed_agg_sliding",
    oracle=f"""
    WITH shifted AS (
        SELECT e.*,
               time_bucket(INTERVAL '30 minutes', e.ts)
                 - k.k * INTERVAL '30 minutes' AS window_start
        FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           event_type,
           {sql_dsum('value')} AS total_value,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS unique_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
           MAX(ts) AS max_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM shifted
    GROUP BY 1, 2, 3
    """,
)
def q_windowed_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/T2 (sliding: 1 h window / 30 min slide; each event in 2 windows) —
    reference spark/app.py:165. Oracle expands the slide by cross-joining
    offsets k in [0, window/slide)."""
    return windowed_agg(
        _t(spark, sf_dir, "events"),
        window="1 hour",
        slide="30 minutes",
        keys=["event_type"],
    )


@query(
    "enrich_events",
    oracle="""
    SELECT e.event_id, e.user_id,
           c.c_mktsegment AS segment,
           c.c_acctbal AS acctbal,
           n.n_name AS nation_name,
           e.value
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2 — broadcast + second dim join (reference spark/app.py:128-137)."""
    df = enrich_events(
        _t(spark, sf_dir, "events"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
    )
    return df.select("event_id", "user_id", "segment", "acctbal", "nation_name", "value")


_DAILY_CTE = f"""
    WITH enriched AS (
        SELECT CAST(e.ts AS DATE) AS event_date,
               e.event_type,
               c.c_mktsegment AS segment,
               (c.c_acctbal > 5000.0) AS is_premium,
               e.value, e.event_id
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
    ),
    daily AS (
        SELECT event_date, event_type, segment,
               {sql_dsum('value')} AS daily_revenue,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS daily_events
        FROM enriched
        GROUP BY 1, 2, 3
    )
"""


@query(
    "daily_segment_metrics",
    oracle=_DAILY_CTE
    + """
    SELECT event_date, event_type, segment, daily_revenue, daily_events,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY event_date, event_type
               ORDER BY daily_revenue DESC NULLS LAST, segment ASC NULLS FIRST
           ) AS INT) AS revenue_rank_in_type
    FROM daily
    """,
)
def q_daily_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 part 1 (A2 + W1) — reference kafka_spark_etl.py:64-78 as Spark."""
    return daily_segment_metrics(
        _t(spark, sf_dir, "events"), _t(spark, sf_dir, "customer")
    )


@query(
    "premium_rollup",
    oracle=_DAILY_CTE
    + f"""
    , seg_dim AS (
        SELECT c_mktsegment AS segment,
               MAX(c_acctbal > 5000.0) AS segment_is_premium
        FROM customer
        GROUP BY 1
    )
    SELECT d.event_date, d.event_type, s.segment_is_premium,
           {sql_dsum('d.daily_revenue')} AS total_revenue,
           CAST(SUM(d.daily_events) AS BIGINT) AS total_events
    FROM daily d
    LEFT JOIN seg_dim s ON d.segment = s.segment
    GROUP BY 1, 2, 3
    """,
)
def q_premium_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 part 2 (P7 + J3 + A3) — reference kafka_spark_etl.py:81-100."""
    return premium_rollup(_t(spark, sf_dir, "events"), _t(spark, sf_dir, "customer"))
