"""SparkSession construction with the engine's default tuning profile.

Derived from the reference's session bootstrap (reference spark/app.py:13-33)
with two deliberate departures, both documented in SURVEY.md §7.0:

- ``spark.sql.autoBroadcastJoinThreshold`` is left at Spark's default (10 MB)
  instead of the reference's ``-1``: the reference disabled auto-broadcast
  purely to demonstrate a sort-merge join (spark/app.py:25-26); at 100 TB we
  want Catalyst + AQE picking broadcast joins for every dim-sized side.
- shuffle partitions default to a caller-tunable value rather than the
  reference's hard-coded 8 (spark/app.py:17), since the right number is a
  function of cluster size and input volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.getenv("SPARK_GRAFT_CPUS", "32"))

# Runtime-settable SQL confs the engine's correctness depends on. These are
# (re)applied after getOrCreate — Spark silently ignores builder configs when
# a session already exists (e.g. the driver hands us its own session), so
# anything correctness-critical must also be applied through spark.conf.set.
RUNTIME_CONFS: dict[str, str] = {
    # Testdata timestamps are naive UTC instants; date/window semantics must
    # not depend on the JVM's wall clock (a session at America/New_York would
    # shift day boundaries vs the DuckDB oracle).
    "spark.sql.session.timeZone": "UTC",
    # Spark has no nanosecond timestamp type; read parquet TIMESTAMP(NANOS)
    # (testdata events.ts) as long and convert in catalog.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Incremental daily batches: mode('overwrite') + partitionBy must replace
    # only the partitions present in THIS write. Spark's default ('static')
    # truncates the whole table root first, so a nightly job for day N would
    # silently delete days 1..N-1 (the reference's batch writes a fresh
    # per-date file each run — kafka_spark_etl.py:102-107 — and never
    # destroys prior days).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply :data:`RUNTIME_CONFS` to an existing session (idempotent).

    Called by catalog.load_table so the engine behaves correctly on *any*
    caller-provided session, not just ones built by :func:`get_spark`.
    """
    for k, v in RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def get_spark(
    app_name: str = "kafkastreamingetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuning profile.

    The profile keeps every Catalyst/AQE feature the reference enables
    (reference spark/app.py:16-28): AQE with partition coalescing and
    skew-join handling, dynamic partition pruning, and explicit shuffle
    parallelism. Arrow execution is enabled for the pandas-UDF extension
    points (similarity / multimodal operators).
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        # Heap for the single local-mode JVM (driver == all executors).
        # Spark's default is 1g — at local[32] that is ~30 MB of execution
        # memory per concurrent task, which OOMs legitimate plans an order
        # of magnitude below what the host supports (found by the x50
        # scale-stress: shingle aggregation over 250k docs). Static conf:
        # only effective when THIS call launches the JVM; a caller-provided
        # session keeps its own sizing.
        "spark.driver.memory": os.getenv("SPARK_GRAFT_DRIVER_MEM", "16g"),
        # shuffle / parallelism (reference spark/app.py:17-18)
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.default.parallelism": str(n_shuffle),
        # Adaptive Query Execution (reference spark/app.py:20-22)
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Dynamic Partition Pruning (reference spark/app.py:24)
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
        # UTC everywhere: event-time windows / to_date must be computed on
        # the same wall clock as oracle engines reading naive parquet ts.
        "spark.sql.session.timeZone": "UTC",
        # Arrow for pandas UDF extension points — the vectorized Python path
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Spark has no nanosecond timestamp type; read parquet
        # TIMESTAMP(NANOS) (testdata events.ts) as long and convert in
        # catalog.load_table.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Streaming state at scale: RocksDB bounds driver/executor heap usage
        # where the default HDFSBackedStateStore would not (SURVEY.md §4).
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate ignores builder configs on an already-running session;
    # re-apply everything runtime-settable so the tuning profile holds —
    # but the CALLER's explicit extra_conf wins over the profile defaults
    # (re-applying only the defaults here would silently stomp e.g. a
    # caller-supplied shuffle.partitions or session timezone).
    ensure_runtime_confs(spark)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    if extra_conf:
        for k, v in extra_conf.items():
            try:
                spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 — static conf on live session
                pass
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_test_spark(app_name: str = "kafkastreamingetl_spark_test") -> SparkSession:
    """Local session for tests / bench: ``local[$SPARK_GRAFT_CPUS]``."""
    cpus = os.getenv("SPARK_GRAFT_CPUS", "32")
    return get_spark(app_name=app_name, master=f"local[{cpus}]")
