"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 (+ the LLM-data-pipeline extensions:
text stats/quality/SimHash, exact + MinHash-LSH dedup, cosine/hyperplane-LSH/
IVF similarity search, multimodal binary extraction) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each — every registered query is
oracle-checked, none are rows-only. Column names/types are aligned on both
sides; float aggregates go through DECIMAL(18,4) and hashes through
md5-hex→bigint so values are order-independent and bit-identical across
engines (see kafkastreamingetl_spark/functions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafkastreamingetl_spark.catalog import load_table  # noqa: E402
from kafkastreamingetl_spark.queries import QUERIES, ORACLE_SQL  # noqa: E402
from kafkastreamingetl_spark.operators.rollup import daily_segment_metrics  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the daily segment rollup
    (the reference's Airflow batch job X2, re-expressed as one Spark query).
    """
    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return daily_segment_metrics(events, customer)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
