"""Sources: Kafka adapters, file-stream twins, synthetic event generation.

Covers the reference's source surface (SURVEY.md §2.1):

- S1 Kafka streaming source (reference spark/app.py:53-59) — adapter that
  builds the reader; needs the spark-sql-kafka connector + a broker at
  runtime, neither of which exists in the test container, so tests exercise
  the file-source twin instead (same downstream lineage).
- S2 JSON decode + envelope flatten (reference spark/app.py:61-63).
- S9 synthetic event generator (reference producer/producer.py:19-44) —
  re-expressed as Spark-native column expressions over ``range`` (batch,
  seed-deterministic) or the ``rate`` source (streaming). The reference's
  dirty-data features are preserved: messy casing/padding on the categorical
  column, ~1/6 null categorical, 10% null metric, 5% duplicate event ids,
  occasional unmatched user ids.

All generators stay JVM-side (``F.rand(seed)`` + array lookups) — the
reference's Python loop at 5 msg/s becomes millions of rows/s per core, and
the same expressions run unchanged on a 1000-executor cluster because
``rand`` is seeded per-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The canonical event schema (testdata `events`, TESTDATA.md) — the engine's
# analogue of the reference's 7-field wire schema (spark/app.py:40-50).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENT_TYPES = ("click", "view", "purchase", "refund", "search")
# Messy variants the cleaning stage must normalize (reference
# producer/producer.py:35-36 injects 'mobile ', 'MOBILE', ' Mobile').
MESSY_EVENT_TYPES = tuple(
    v for t in EVENT_TYPES for v in (t, t.upper(), f" {t.capitalize()} ", f"{t} ")
)


# ---------------------------------------------------------------------------
# S1/S2: Kafka in, JSON decode
# ---------------------------------------------------------------------------


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1/T7: Kafka streaming reader (reference spark/app.py:53-59).

    ``startingOffsets=earliest`` replays the full topic on a fresh
    checkpoint, exactly as the reference configures. Requires the
    spark-sql-kafka connector on the classpath (not bundled here).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def decode_json_events(
    df: DataFrame, schema: T.StructType = EVENT_SCHEMA, value_col: str = "value"
) -> DataFrame:
    """S2/F1/F2: bytes→string→``from_json``→flatten (reference
    spark/app.py:61-63). Malformed JSON yields null fields (PERMISSIVE),
    matching the reference's behavior."""
    return df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("data")
    ).select("data.*")


def file_events_source(
    spark: SparkSession, path: str, schema: T.StructType = EVENT_SCHEMA
) -> DataFrame:
    """Streaming file source over a parquet directory — the deterministic
    test twin of the Kafka source (SURVEY.md §5.2): same downstream lineage,
    replayable, no broker. Streaming file sources require an explicit
    schema."""
    return spark.readStream.schema(schema).parquet(path)


# ---------------------------------------------------------------------------
# Landing formats: CSV / JSON-lines (engine extension beyond the reference's
# Kafka+parquet surface)
# ---------------------------------------------------------------------------
#
# Row-parsed text formats are LANDING formats, not lake formats: a CSV/JSON
# scan reads and parses every byte of every row (no column pruning, no
# row-group statistics, limited predicate pushdown), so at 100 TB the
# pipeline shape is land-as-text -> convert once to parquet -> query parquet.
# Both readers default to PERMISSIVE parsing with a corrupt-record column so
# one malformed row quarantines instead of failing the job — the same policy
# the JSON envelope decode uses (decode_json_events).

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: T.StructType) -> T.StructType:
    """Schema + the PERMISSIVE-mode quarantine column (must be declared in
    the read schema for the parser to populate it)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    *,
    header: bool = True,
    streaming: bool = False,
    quarantine: bool = True,
) -> DataFrame:
    """CSV landing source, batch or streaming file-source (same lineage
    downstream either way). Explicit schema always — schema inference is a
    full extra pass over the data and is banned at scale."""
    read_schema = _with_corrupt_col(schema) if quarantine else schema
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(read_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        # preserve field whitespace byte-for-byte (dirty landing data keeps
        # its padding for the cleaning stage to normalize; note Spark's CSV
        # *writer* trims by default — set the same two options false there)
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )


def jsonl_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    *,
    streaming: bool = False,
    quarantine: bool = True,
) -> DataFrame:
    """JSON-lines landing source (one object per line — the splittable JSON
    layout; multiline JSON documents are not splittable and don't scale)."""
    read_schema = _with_corrupt_col(schema) if quarantine else schema
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_split(
    df: DataFrame, *, materialize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(good rows without the corrupt column, quarantined raw lines).

    Spark refuses plans over raw CSV/JSON that reference ONLY the internal
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), so the parsed frame is persisted before splitting — both halves
    then read the one parse. At 100 TB the same rule applies with storage
    instead of cache: land the parsed frame to parquet once, split from
    that; pass ``materialize=False`` when the input is already materialized.

    Streaming frames cannot persist (and a streaming split re-reads the
    source per sink anyway — that IS the materialization), so the cache is
    batch-only; both halves of a streaming split stay valid readStream
    lineage.
    """
    if materialize and not df.isStreaming:
        df = df.persist()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


# ---------------------------------------------------------------------------
# S9: synthetic dirty-event generation
# ---------------------------------------------------------------------------


def _pick(arr: tuple[str, ...], rand: F.Column) -> F.Column:
    """Uniform pick from a literal array via a [0,1) random column."""
    lit = F.array(*[F.lit(v) for v in arr])
    return F.element_at(lit, (rand * len(arr)).cast("int") + 1)


def _event_columns(df: DataFrame, *, seed: int, n_users: int, base_ts: str) -> DataFrame:
    """The dirty-event column pack over a ``seq`` long column.

    Mirrors the reference producer's distributions
    (producer/producer.py:19-44): 5% duplicate event ids (consecutive seq
    collapsed), messy-cased/padded categorical values, ~1/6 null
    categorical (the producer's null-country rate, producer.py:30-36 —
    exercising the normalize null→'unknown' branch), 10% null metric,
    ~5% of user ids outside the dim range (unmatched in enrichment joins).
    Fully deterministic for a given (seed, row count, partitioning of
    ``df``): every random column derives from seeded ``rand``.
    """
    r = lambda off: F.rand(seed + off)  # noqa: E731
    dup = (r(1) < 0.05) & (F.col("seq") > 0)
    return df.select(
        # 5% of rows reuse the previous sequence id -> duplicate event_id
        F.when(dup, F.col("seq") - 1).otherwise(F.col("seq")).alias("event_id"),
        (
            F.lit(base_ts).cast("timestamp")
            + F.make_interval(secs=F.round(F.col("seq") * 0.5 + r(2) * 30, 3))
        ).alias("ts"),
        F.when(r(3) < 0.05, F.lit(10_000_000))
        .otherwise((r(4) * n_users).cast("long"))
        .alias("user_id"),
        F.when(r(9) < 1.0 / 6, F.lit(None).cast("string"))
        .otherwise(_pick(MESSY_EVENT_TYPES, r(5)))
        .alias("event_type"),
        F.when(r(6) < 0.10, F.lit(None).cast("double"))
        .otherwise(F.round(r(7) * 195 + 5, 2))
        .alias("value"),
        F.to_json(F.struct((r(8) * 100).cast("int").alias("k"))).alias("props"),
    )


def synthetic_events_batch(
    spark: SparkSession,
    n: int,
    *,
    seed: int = 42,
    n_users: int = 1500,
    base_ts: str = "2024-01-01 00:00:00",
    n_partitions: int | None = None,
) -> DataFrame:
    """Seed-deterministic dirty events for tests (S9 batch twin).

    ``spark.range`` is already distributed; the column pack adds no shuffle,
    so generation parallelizes linearly (contrast: the reference's
    single-threaded 5 msg/s Python loop).
    """
    rng = spark.range(0, n, numPartitions=n_partitions or spark.sparkContext.defaultParallelism)
    return _event_columns(
        rng.select(F.col("id").alias("seq")),
        seed=seed,
        n_users=n_users,
        base_ts=base_ts,
    )


def synthetic_events_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    *,
    seed: int = 42,
    n_users: int = 1500,
    base_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """S9 streaming: ``rate`` source + the same column pack (reference
    producer loop, producer/producer.py:54-63, minus the sleep)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return _event_columns(
        rate.select(F.col("value").alias("seq")),
        seed=seed,
        n_users=n_users,
        base_ts=base_ts,
    )
