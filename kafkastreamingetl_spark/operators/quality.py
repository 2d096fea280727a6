"""Single-scan data-quality reporting (engine extension of X4).

The reference's quality check is one row count with a warn threshold
(airflow/dags/kafka_spark_etl.py quality step; SURVEY §2.9 X4 — already
covered by operators.rollup.quality_check). Production pipelines need the
richer form: N declarative expectations evaluated in ONE pass — each rule
a violation predicate folded into a conditional sum, so a 100 TB scan
yields the whole report for the cost of a single aggregation (map-side
combined, one 1-row result). Never one job per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-row report: total rows + one violation count per named rule.

    ``rules`` maps report column name → *violation* predicate (true = bad
    row). All rules evaluate in a single aggregation over a single scan.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
        for name, pred in rules.items()
    ]
    return df.agg(*aggs)


def events_quality_report(df: DataFrame) -> DataFrame:
    """The event-stream expectation set: null keys/metrics, domain range,
    and duplicate keys (exact distinct — one extra Expand, acceptable for
    a report; swap to approx_count_distinct for a cheap continuous probe).
    """
    report = quality_report(
        df,
        {
            "null_event_type": F.col("event_type").isNull(),
            "null_value": F.col("value").isNull(),
            "value_out_of_range": (F.col("value") < 0) | (F.col("value") > 500),
            "ts_out_of_domain": F.col("ts") < F.lit("2020-01-01").cast("timestamp"),
        },
    )
    distinct_keys = df.agg(
        F.count_distinct(F.col("event_id")).alias("_distinct_ids")
    )
    return report.crossJoin(F.broadcast(distinct_keys)).select(
        "n_rows",
        "null_event_type",
        "null_value",
        "value_out_of_range",
        "ts_out_of_domain",
        (F.col("n_rows") - F.col("_distinct_ids")).alias("dup_event_ids"),
    )


def sql_events_quality_report(table: str = "events") -> str:
    return f"""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_event_type,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_value,
           CAST(SUM(CASE WHEN value < 0 OR value > 500 THEN 1 ELSE 0 END)
               AS BIGINT) AS value_out_of_range,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2020-01-01' THEN 1 ELSE 0 END)
               AS BIGINT) AS ts_out_of_domain,
           COUNT(*) - COUNT(DISTINCT event_id) AS dup_event_ids
    FROM {table}
    """
