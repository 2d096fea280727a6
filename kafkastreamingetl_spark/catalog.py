"""Table catalog: load the testdata star schema and register temp views.

Mirrors the reference's two table-acquisition paths — parquet directory scan
(reference airflow/dags/kafka_spark_etl.py:47) and in-memory literal dims
(reference spark/app.py:87-125) — as Spark-native sources. Views registered
here are the entry point for the SQL door (reference spark/app.py:140-156).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Parquet columns stored as TIMESTAMP(NANOS): Spark has no ns timestamp type,
# so these are read as long (nanosAsLong) and converted to microsecond
# TimestampType here. The testdata generator emits µs-exact values, so the
# DIV 1000 is lossless.
NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with partition discovery (reference analogue: S6).

    NOTE: applies the engine's runtime session confs (UTC timezone,
    nanosAsLong — see session.RUNTIME_CONFS) to the caller's session, because
    correctness of timestamps/window boundaries depends on them even when the
    session was built elsewhere (e.g. the driver's). This is a deliberate,
    documented session-wide side effect.
    """
    ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = NS_TIMESTAMP_COLS.get(name, ())
    df = spark.read.parquet(path)
    for c in ns_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (reference spark/app.py:140) so
    ``spark.sql`` queries resolve against the same lineage as the DataFrame
    API."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def dim_from_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """In-memory dimension table (reference spark/app.py:104,125 — S3).

    Small dims should stay broadcast-sized; callers join them with
    ``F.broadcast`` (see operators.enrichment) instead of repartition+cache —
    at 1000 executors a 5-row dim repartitioned to 4 (reference
    spark/app.py:128) would still shuffle the fact side.
    """
    return spark.createDataFrame(rows, schema=schema)
