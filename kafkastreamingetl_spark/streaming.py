"""Streaming runtime: sink policies, multi-sink fan-out, deterministic runs.

Re-expresses the reference's streaming main program (reference
spark/app.py:184-209) as composable policy functions:

- S4  parquet append sink with checkpoint + trigger + hive partitioning
- S5  console sink (update mode)
- S8  Kafka producer sink (``to_json(struct(*))`` → value bytes)
- T4  output modes, T5 triggers, T6 checkpointing, T8 multi-sink fan-out
- a ``foreachBatch`` bridge so batch operators (e.g. the daily rollup) can
  run continuously against micro-batches
- :func:`run_available_now` — the test harness path: processes everything
  available, then stops (deterministic; SURVEY.md §5.2), replacing
  wall-clock triggers with replayable runs.

Checkpoint policy at scale: one checkpoint dir per query (never shared),
RocksDB state store (set in session.get_spark) so streaming state lives off
the JVM heap, and ``dropDuplicatesWithinWatermark`` upstream keeps dedup
state bounded (operators.cleaning).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_parquet_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    partition_by: str | list[str] | None = None,
    trigger_seconds: int | None = 30,
    available_now: bool = False,
    output_mode: str = "append",
) -> StreamingQuery:
    """S4/H5/T4/T5/T6: the reference's parquet lake sink
    (spark/app.py:189-197): append mode, checkpointed, hive-partitioned,
    micro-batch trigger. ``available_now=True`` swaps the wall-clock trigger
    for a process-everything-then-stop run (tests, backfills)."""
    w = (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        w = w.partitionBy(*cols)
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_seconds is not None:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def write_console_stream(
    df: DataFrame,
    *,
    output_mode: str = "update",
    truncate: bool = False,
    available_now: bool = False,
) -> StreamingQuery:
    """S5: debug console sink, update mode, untruncated (reference
    spark/app.py:200-205). Default trigger is as-fast-as-possible, as the
    reference leaves it."""
    w = (
        df.writeStream.outputMode(output_mode)
        .format("console")
        .option("truncate", str(truncate).lower())
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_memory_stream(
    df: DataFrame,
    name: str,
    *,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """Memory sink for tests: results land in the temp view ``name``.

    Memory sinks collect to the driver — test-sized data only, never a
    production path.
    """
    w = df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
) -> StreamingQuery:
    """S8: Kafka producer sink. Rows are serialized like the reference
    producer (json.dumps → utf-8, producer/producer.py:48-51) via
    ``to_json(struct(*))``. Requires the Kafka connector at runtime."""
    from pyspark.sql import functions as F

    payload = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def foreach_batch_sink(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    *,
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """The foreachBatch bridge: run arbitrary *batch* logic (e.g. the daily
    rollup, multi-table writes) against each micro-batch — the idiomatic way
    to reuse batch operators in streaming (SURVEY.md §2.1 S8 note)."""
    w = df.writeStream.foreachBatch(batch_fn).option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_seconds is not None:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def upsert_parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    key_cols: list[str],
    order_col: str,
    partition_col: str,
    delete_col: str | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """Exactly-once keyed upsert into a hive-partitioned parquet table.

    The plain parquet streaming sink is append-only; late corrections and
    replays therefore duplicate keys. This sink gives MERGE semantics with
    parquet alone (no Delta/Iceberg in this container — with a real table
    format, swap the body for ``MERGE INTO``): per micro-batch,

    1. find the hive partitions the batch touches (distinct partition
       values — a model-sized collect, bounded by partitions-per-batch,
       never row-scaled);
    2. read ONLY those partitions back (partition pruning makes this
       proportional to the batch's blast radius, not the table);
    3. merge old+new and keep one row per key — newest by ``order_col``,
       full-column tiebreak, same deterministic-survivor contract as
       operators.cleaning.dedup_deterministic;
    4. rewrite exactly the touched partitions (dynamic partition overwrite,
       applied defensively per batch via ``ensure_runtime_confs`` — on a
       caller-built session Spark's default is STATIC overwrite, which
       would truncate the whole table root on step 4).

    Contract: ``partition_col`` must be an immutable function of the key
    (event_date of the key's first event, a hash bucket, ...). The merge
    reads only the partitions the batch touches, so a "correction" that
    MOVES a key to a different partition value would leave the stale row
    behind in the old partition — the same immutable-partition-path rule
    Hudi-style upsert tables impose. Keys with a NULL partition value are
    supported (they merge against the hive default partition).

    CDC deletes: with ``delete_col`` set (a boolean column), a key whose
    NEWEST version is a tombstone is deleted — the WHEN MATCHED THEN
    DELETE leg of MERGE, implemented as a SOFT delete: the winning
    tombstone row stays in the table (flag true) and consumers read
    through :func:`read_upserted`, which filters it. Keeping the
    tombstone is what makes deletes correct under late data and replays:
    a stale update arriving in a LATER batch still loses the newest-wins
    contest to the persisted tombstone — dropping tombstones at write
    would silently resurrect deleted keys. (Real lake formats do the
    same, then garbage-collect tombstones past a retention window — that
    compaction step composes with operators/maintenance.)

    Exactly-once: the write is a deterministic function of (table state,
    batch content), so replaying a failed micro-batch from the checkpoint
    converges to the same bytes — idempotent, asserted by replay in
    tests/test_streaming_upsert.py. ``localCheckpoint`` before the
    overwrite truncates the merged plan's lineage, which both avoids
    Spark's read-overwrite-same-path conflict and guarantees the merge is
    fully materialized before any partition is replaced.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from .operators.cleaning import dedup_deterministic
    from .session import ensure_runtime_confs

    if delete_col is not None and delete_col not in df.columns:
        raise ValueError(
            f"delete_col {delete_col!r} not in stream columns {df.columns}"
        )

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # dynamic partition overwrite is load-bearing for step 4; apply it
        # on THIS session — the sink must not depend on the caller having
        # built the session through this engine's factory
        ensure_runtime_confs(spark)
        touched = [
            r[0] for r in batch.select(partition_col).distinct().collect()
        ]
        # SQL IN never matches NULL: a null partition value needs an
        # explicit isNull leg, or existing null-partition rows would be
        # dropped from the merge while the overwrite still replaces
        # __HIVE_DEFAULT_PARTITION__ — silently losing them
        non_null = [v for v in touched if v is not None]
        pred = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        if any(v is None for v in touched):
            pred = pred | F.col(partition_col).isNull()
        merged = batch
        try:
            # mergeSchema: partitions written before a mid-life column
            # addition carry the old footer — a plain read would resolve
            # to ONE footer's schema and either drop the new column or
            # fail the union; allowMissingColumns fills the gap with
            # nulls in whichever side lacks a column (evolution in either
            # direction), and the winner rewrite carries the union schema
            existing = (
                spark.read.option("mergeSchema", "true")
                .parquet(path)
                .where(pred)
            )
            merged = batch.unionByName(existing, allowMissingColumns=True)
        except AnalysisException:
            pass  # first batch: nothing to merge
        lead = [F.desc_nulls_last(order_col)]
        tail = [
            F.asc_nulls_first(c)
            for c in merged.columns
            if c not in (*key_cols, order_col)
        ]
        winner = dedup_deterministic(merged, key_cols, [*lead, *tail])
        winner.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
            partition_col
        ).parquet(path)

    return foreach_batch_sink(
        df,
        merge_batch,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )


def read_upserted(spark, path: str, *, delete_col: str | None = None) -> DataFrame:
    """Read an :func:`upsert_parquet_sink` table as its CURRENT state:
    one live row per key, soft-deleted keys (newest version a tombstone)
    filtered out. This is the sink's read contract — raw readers see
    tombstone rows, which exist precisely so late stale updates cannot
    resurrect deleted keys."""
    from pyspark.sql import functions as F

    # mergeSchema: see merge_batch — evolved partitions must not lose
    # columns to single-footer schema resolution
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if delete_col is not None:
        df = df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return df


def fan_out(
    df: DataFrame, sinks: list[Callable[[DataFrame], StreamingQuery]]
) -> list[StreamingQuery]:
    """T8: start several sinks off one lineage (reference spark/app.py:
    189-209 runs parquet + console concurrently). Each sink is an
    independent StreamingQuery with its own checkpoint/trigger; the source
    is re-read per query (Kafka replays; file sources re-list)."""
    return [make_sink(df) for make_sink in sinks]


def reference_pipeline(
    events_stream: DataFrame,
    user_dim: DataFrame,
    *,
    lake_path: str,
    checkpoint_dir: str,
    watermark: str = "30 seconds",
    window: str = "1 minute",
    slide: str | None = "30 seconds",
    available_now: bool = False,
    trigger_seconds: int | None = 30,
    with_console: bool = False,
) -> list[StreamingQuery]:
    """The reference's complete streaming program (spark/app.py:main,
    53-209) as one composition: decoded events → clean (normalize/fill/
    watermarked dedup) → enrich (stream⋈static dim join) → sliding window
    aggregate → parquet lake sink (+ optional console), fan-out off one
    lineage.

    ``events_stream`` is any decoded event stream (Kafka via
    sources.kafka_source + decode_json_events, file source, or the rate
    generator); ``user_dim`` is a static dim joined stream-static (J1 —
    broadcast by AQE when dim-sized). Each sink gets its own checkpoint
    subdirectory (T6: never share checkpoints between queries).
    """
    import os

    from pyspark.sql import functions as F

    from .operators.cleaning import clean_events_streaming
    from .operators.windows import windowed_agg

    cleaned = clean_events_streaming(events_stream, watermark=watermark)
    dim = user_dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = cleaned.join(dim, "user_id", "left")
    # the stream already carries the cleaning stage's watermark — redefining
    # one on the same lineage is an error with chained stateful operators,
    # so the window aggregate reuses it (HLL distinct, append-safe)
    agg = windowed_agg(
        enriched,
        window=window,
        slide=slide,
        keys=["event_type_norm", "segment"],
        approx_distinct=True,
    )
    sinks: list[Callable[[DataFrame], StreamingQuery]] = [
        lambda df: write_parquet_stream(
            df,
            lake_path,
            os.path.join(checkpoint_dir, "lake"),
            # hive layout by the dim attribute, as the reference partitions
            # its lake by the joined country column (spark/app.py:194)
            partition_by="segment",
            available_now=available_now,
            trigger_seconds=trigger_seconds,
        )
    ]
    if with_console:
        sinks.append(
            lambda df: write_console_stream(df, available_now=available_now)
        )
    return fan_out(agg, sinks)


def run_available_now(queries: list[StreamingQuery], timeout_sec: int = 300) -> None:
    """Await a set of availableNow queries (deterministic test runs).

    Raises on timeout or query failure (surfacing the real streaming
    exception instead of a silent hang).
    """
    for q in queries:
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming query {q.name or q.id} did not finish in {timeout_sec}s"
            )
        if q.exception() is not None:
            raise q.exception()


def alltime_dedup_sink(
    df: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """UNBOUNDED all-time streaming dedup with bounded state: the semantics
    of the reference's whole-stream ``dropDuplicates`` (reference
    spark/app.py:79 — state grows forever) delivered instead by a
    persisted (hash, content) index, so executor state stays zero and the
    dedup horizon is the life of the index, not the watermark. Completes
    the dedup family: ``dropDuplicatesWithinWatermark`` (bounded horizon,
    operators.cleaning) for in-flight duplicates, THIS for forever ones.

    Per micro-batch:

    1. anti-join the batch against index entries from EARLIER batches
       only (``batch_id < current`` — partition-pruned read);
    2. keep the min-id survivor per content within the batch;
    3. write survivors to ``out_path`` partitioned by the batch id with
       dynamic partition overwrite — a replayed batch overwrites ITS OWN
       partition, never appends twice;
    4. append the survivors' (hash, content, batch_id) to the index.

    Replay safety is the point of the ``batch_id`` discipline: a retried
    batch excludes its own failed attempt's index rows from the anti-join
    (so nothing self-suppresses into data loss), recomputes the same
    survivor set, and overwrites the same output partition — idempotent
    convergence, asserted in tests. Duplicate index rows from a replay
    are harmless: the anti-join is a set-membership probe.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from .functions import hash60
    from .operators.cleaning import dedup_deterministic
    from .session import ensure_runtime_confs

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        ensure_runtime_confs(spark)  # dynamic partition overwrite
        hashed = batch.withColumn("_h", hash60(F.col(content_col)))
        try:
            seen = (
                spark.read.parquet(index_path)
                .where(F.col("batch_id") < batch_id)
                .select("_h", content_col)
            )
            fresh = hashed.join(seen, ["_h", content_col], "left_anti")
        except AnalysisException:
            fresh = hashed  # first batch: no index yet
        survivors = dedup_deterministic(
            fresh, ["_h", content_col], [F.asc(id_col)]
        ).localCheckpoint(eager=True)
        (
            survivors.drop("_h")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        (
            survivors.select("_h", content_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(index_path)
        )

    return foreach_batch_sink(
        df,
        dedup_batch,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )


def neardup_flag_sink(
    df: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """Streaming NEAR-duplicate detection with zero executor state: the
    LSH-banding complement to :func:`alltime_dedup_sink` (which only
    catches bit-exact repeats). Per micro-batch, each document's MinHash
    band signatures probe a persisted band index of everything seen in
    earlier batches; a shared band means "probable near-dup of an earlier
    doc". Within-batch near-dups are caught by the same bucketed self-join
    the batch pipeline uses (lower id wins). The report row per document:

        (doc_id, n_index_bands, n_batch_partners, is_neardup, batch_id)

    Flagging, not dropping, is deliberate: near-dup candidates are
    probabilistic (band collisions), so the streaming tier marks them and
    a downstream batch verify (exact Jaccard over the flagged minority)
    makes the drop decision — the same candidates→verify split the batch
    dedup family uses, stretched across the stream/batch boundary.

    State discipline mirrors ``alltime_dedup_sink``: executor state zero,
    horizon = life of the index, the index probe excludes
    ``batch_id >= current`` so a retried batch never self-suppresses, the
    report partition is overwritten per batch id (replay-idempotent), and
    duplicate index rows from a replay are neutralized by the distinct
    membership probe. Documents too short to shingle have no signatures
    and no report row (same contract as ``minhash_signatures``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from .operators.dedup import minhash_signatures
    from .session import ensure_runtime_confs

    def flag_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        ensure_runtime_confs(spark)  # dynamic partition overwrite
        sigs = minhash_signatures(batch, content_col, id_col).localCheckpoint(
            eager=True
        )
        try:
            seen = (
                spark.read.parquet(index_path)
                .where(F.col("batch_id") < batch_id)
                .select("band", "sig")
                .distinct()
            )
            idx_hits = (
                sigs.join(seen, ["band", "sig"])
                .groupBy(id_col)
                .agg(F.count_distinct("band").alias("n_index_bands"))
            )
        except AnalysisException:  # first batch: no index yet
            idx_hits = (
                sigs.select(id_col)
                .limit(0)
                .withColumn("n_index_bands", F.lit(0).cast("bigint"))
            )
        a = sigs.select(F.col(id_col).alias("_a"), "band", "sig")
        batch_hits = (
            a.join(sigs, ["band", "sig"])
            .where(F.col("_a") < F.col(id_col))
            .groupBy(id_col)
            .agg(F.count_distinct("_a").alias("n_batch_partners"))
        )
        report = (
            sigs.select(id_col)
            .distinct()
            .join(idx_hits, id_col, "left")
            .join(batch_hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_index_bands", F.lit(0)).alias("n_index_bands"),
                F.coalesce("n_batch_partners", F.lit(0)).alias(
                    "n_batch_partners"
                ),
            )
            .withColumn(
                "is_neardup",
                (F.col("n_index_bands") > 0) | (F.col("n_batch_partners") > 0),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        report.write.mode("overwrite").partitionBy("batch_id").parquet(out_path)
        (
            sigs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(index_path)
        )

    return foreach_batch_sink(
        df,
        flag_batch,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )


def neardup_ingest_sink(
    df: DataFrame,
    corpus_path: str,
    index_path: str,
    checkpoint: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """Streaming twin of the daily near-dup ingest loop (the batch
    ``neardup-ingest`` CLI, jobs.py): each micro-batch is deduped against
    the persisted signature index with exact-Jaccard verification, the
    SURVIVORS' signatures/features are appended back to the index, and
    the survivors land in the corpus — so batch N+1 dedups against
    everything batch N accepted, continuously. Unlike
    :func:`neardup_flag_sink` (candidates-only flagging for a downstream
    verifier), this sink makes the DROP decision in-stream, running the
    identical candidates→verify functions the batch loop runs
    (``incremental_neardup_from_index`` semantics per micro-batch; the
    first-ever batch bootstraps with ``neardup_dedup`` exactly like the
    CLI) — streaming==batch by construction, checked by differential test.

    Replay discipline (the reference's T6 checkpoint-restart contract,
    ``spark/app.py:189-209``, applied to the LLM dedup lane): every write
    — corpus, sigs, feats — is partitioned by ``batch_id`` and dynamically
    OVERWRITTEN, so a batch retried after a mid-batch crash replaces its
    own partitions instead of double-appending; the index probe excludes
    ``batch_id >= current`` so a replayed batch never collides with its
    own previous half-written signatures (the batch CLI's index-first
    ordering makes a crash *visible*; partition-scoped overwrite makes it
    *self-healing*). Executor state is zero — the whole loop's state lives
    in the parquet index, horizon = life of the corpus, daily cost tracks
    the increment (the base is never re-shingled).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from .operators.dedup import (
        NEARDUP_MIN_JACCARD,
        _incremental_neardup_against,
        minhash_signatures,
        neardup_dedup,
        shingle_features,
    )
    from .session import ensure_runtime_confs

    mj = NEARDUP_MIN_JACCARD if min_jaccard is None else min_jaccard

    def ingest_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        ensure_runtime_confs(spark)  # dynamic partition overwrite
        import os

        sigs_path = os.path.join(index_path, "sigs")
        feats_path = os.path.join(index_path, "feats")
        base_sigs = base_feats = None
        try:
            base_sigs = (
                spark.read.parquet(sigs_path)
                .where(F.col("batch_id") < F.lit(batch_id))
                .drop("batch_id")
            )
            base_feats = (
                spark.read.parquet(feats_path)
                .where(F.col("batch_id") < F.lit(batch_id))
                .drop("batch_id")
            )
            # a replayed FIRST batch sees only its own (excluded) rows —
            # rows-below-current, not path existence, decides bootstrap,
            # so the replay re-runs the same bootstrap code path
            if base_sigs.limit(1).isEmpty():
                base_sigs = None
        except AnalysisException:
            base_sigs = None
        if base_sigs is None:
            survivors = neardup_dedup(
                batch, content_col, id_col, min_jaccard=mj
            )
        else:
            survivors = _incremental_neardup_against(
                batch, base_sigs, base_feats, content_col, id_col, mj
            )
        # eager lineage cut: the index writes below touch the very paths
        # the survivor plan reads; a merely-persisted survivors would be
        # invalidated by Spark's post-write refreshByPath and silently
        # recompute against its own appended signatures (same trap the
        # batch CLI documents)
        survivors = survivors.localCheckpoint(eager=True)
        feats = shingle_features(survivors, content_col, id_col)
        sigs = minhash_signatures(survivors, content_col, id_col, feats=feats)
        # index first, corpus second — same crash-ordering rationale as
        # the batch CLI (a corpus missing one batch is visible and
        # repairable; an index missing corpus rows corrupts silently)
        (
            sigs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(sigs_path)
        )
        (
            feats.select(F.col(id_col), F.col("_hs"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(feats_path)
        )
        (
            survivors.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(corpus_path)
        )

    return foreach_batch_sink(
        df,
        ingest_batch,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )


def contamination_diff_sink(
    df: DataFrame,
    report_path: str,
    index_path: str,
    checkpoint: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """Streaming form of ``operators.dedup.batch_contamination_diff``: per
    micro-batch, report what THIS batch dragged in against the accreted
    index — exact content-hash re-crawls and 13-gram verbatim-passage
    collisions — then append the batch's own hashes/distinct grams to the
    index, so batch N+1 is checked against everything batches ≤ N
    contributed. The report assembly is the SAME function the batch
    operator runs (``contamination_report`` — broadcast direction: the
    ingest-sized batch's sets go out, only matches come back; the index
    parquet is scanned, never shuffled), so streaming == batch by
    construction.

    State: zero in executors — the loop's whole memory is the parquet
    index (hashes: (doc_id, _h); grams: distinct (g) bigints per batch —
    posting-list-shaped, 8 bytes per distinct gram, the same asymptotics
    as the gram side of the batch operator's corpus scan). Replay
    discipline matches ``neardup_ingest_sink``: every write partitioned
    by ``batch_id`` + dynamic partition overwrite, index probe excludes
    ``batch_id >= current``, index written BEFORE the report (a replayed
    batch self-heals its own partitions; a report missing one batch is
    visible and regenerable from the index, the repairable direction).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from .operators.dedup import NGRAM_CONTAM_N, contamination_report
    from .operators.text import shingle_hashes
    from .session import ensure_runtime_confs

    width = NGRAM_CONTAM_N if n is None else n

    def diff_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        ensure_runtime_confs(spark)  # dynamic partition overwrite
        import os

        h_path = os.path.join(index_path, "hashes")
        g_path = os.path.join(index_path, "grams")
        text = F.coalesce(F.col(content_col), F.lit(""))
        proj = batch.select(
            F.col(id_col).alias("doc_id"),
            F.md5(text).alias("_h"),
            shingle_hashes(text, width).alias("_g"),
        ).localCheckpoint(eager=True)  # the index writes below touch the
        # paths a lazy plan would re-read post-refresh (the ingest-sink trap)

        idx_h = idx_g = None
        try:
            idx_h = (
                spark.read.parquet(h_path)
                .where(F.col("batch_id") < F.lit(batch_id))
                .select("_h")
            )
            if idx_h.limit(1).isEmpty():
                idx_h = None
        except AnalysisException:
            idx_h = None
        if idx_h is not None:
            try:
                idx_g = (
                    spark.read.parquet(g_path)
                    .where(F.col("batch_id") < F.lit(batch_id))
                    .select("g")
                )
            except AnalysisException:
                # hashes written, grams crash-lost between the two index
                # writes: bootstrap the gram lane instead of wedging the
                # stream (ADVICE r13, CLI twin has the same rule)
                idx_g = spark.createDataFrame([], "g bigint")

        if idx_h is None:
            # bootstrap: empty index — nothing can be contaminated
            report = proj.select(
                "doc_id",
                F.size("_g").cast("bigint").alias("n_grams"),
                F.lit(False).alias("exact_dup"),
                F.lit(0).cast("bigint").alias("n_gram_collisions"),
                F.lit(False).alias("contaminated"),
            )
        else:
            report = contamination_report(proj, idx_h, idx_g)

        # index first, report second (the repairable crash direction)
        (
            proj.select("doc_id", "_h")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(h_path)
        )
        (
            proj.select(F.explode("_g").alias("g"))
            .distinct()
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(g_path)
        )
        (
            report.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(report_path)
        )

    return foreach_batch_sink(
        df,
        diff_batch,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )


def kafka_round_trip_smoke(
    spark, bootstrap: str, *, n_events: int = 200
) -> dict:
    """The S8 → S1 → T7 runtime loop as a callable: produce the reference
    wire format (to_json(struct(*)) — reference producer/producer.py:50)
    to a fresh topic, consume from earliest, then replay with a second
    fresh reader and compare counts.

    This is the runtime leg the sandbox cannot exercise (no broker, no
    spark-sql-kafka connector jar): tests/test_kafka_integration.py gates
    it behind SPARK_GRAFT_KAFKA_BOOTSTRAP, and ``jobs.py kafka-smoke``
    exposes the same loop as a one-command probe for any environment that
    grows a broker. Requires the spark-sql-kafka connector on the
    classpath; fails loudly (not silently) without it.
    """
    import uuid

    from pyspark.sql import functions as F

    from .sources import decode_json_events, kafka_source, synthetic_events_batch

    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
    events = synthetic_events_batch(spark, n_events, seed=5)
    n_src = events.count()
    payload = events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    )
    (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    decoded = decode_json_events(kafka_source(spark, bootstrap, topic))
    run_available_now([write_memory_stream(decoded, "kafka_smoke_job_1")])
    consumed = spark.table("kafka_smoke_job_1").count()
    replay = decode_json_events(kafka_source(spark, bootstrap, topic))
    run_available_now([write_memory_stream(replay, "kafka_smoke_job_2")])
    replayed = spark.table("kafka_smoke_job_2").count()
    return {
        "topic": topic,
        "produced": n_src,
        "consumed": consumed,
        "replayed": replayed,
        "ok": consumed == n_src and replayed == n_src,
    }


def semantic_flag_sink(
    df: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = 30,
) -> StreamingQuery:
    """Streaming SEMANTIC near-duplicate flagging — the embedding-space
    twin of :func:`neardup_flag_sink`, completing the batch/streaming
    symmetry for the embedding dedup tier exactly as that sink does for
    the MinHash tier. Per micro-batch, each vector's hyperplane signature
    plus its Hamming-1 probe flips query a persisted signature index of
    everything seen in earlier batches; a shared bucket means "probable
    semantic near-dup of an earlier vector". Within-batch candidates come
    from the same probe self-join the batch operator
    (``similarity.embedding_neardup_pairs``) uses. Report row:

        (vec_id, n_index_buckets, n_batch_partners, is_neardup, batch_id)

    Flagging, not dropping: bucket collisions are probabilistic, so the
    streaming tier marks and a downstream batch verify (exact cosine over
    the flagged minority, with the vectors re-joined from the corpus)
    decides — the candidates→verify split stretched across the
    stream/batch boundary, same as the text twin.

    State discipline is the text twin's verbatim: zero executor state,
    horizon = life of the index, ``batch_id < current`` probe exclusion
    (a retried batch never self-suppresses), per-batch-id report
    partition overwrite (replay-idempotent), duplicate index rows
    neutralized by the distinct membership probe. The index stores only
    (signature, batch_id) — never vectors. ``n_planes`` is the same
    blocking-width dial as the batch operator (defaults to the session's
    batch default; scale it ~log2(corpus) — ``similarity.planes_for``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from .operators import similarity as sim
    from .session import ensure_runtime_confs

    width = sim.ANN_N_PLANES if n_planes is None else n_planes
    planes = sim.planes_for(width)

    def flag_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        ensure_runtime_confs(spark)  # dynamic partition overwrite
        base = batch.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col),
            sim.bucket_signature(F.col(vec_col), planes).alias("_sig"),
        )
        probe_arr = F.array(
            F.col("_sig"),
            *[
                sim._flip_bit(F.col("_sig"), i, width)
                for i in range(width)
            ],
        )
        probes = base.select(
            F.col(id_col), F.explode(probe_arr).alias("_bucket")
        ).localCheckpoint(eager=True)
        try:
            seen = (
                spark.read.parquet(index_path)
                .where(F.col("batch_id") < batch_id)
                .select(F.col("_sig").alias("_bucket"))
                .distinct()
            )
            idx_hits = (
                probes.join(seen, "_bucket")
                .groupBy(id_col)
                .agg(F.count_distinct("_bucket").alias("n_index_buckets"))
            )
        except AnalysisException:  # first batch: no index yet
            idx_hits = (
                probes.select(id_col)
                .limit(0)
                .withColumn("n_index_buckets", F.lit(0).cast("bigint"))
            )
        a = probes.select(F.col(id_col).alias("_a"), "_bucket")
        b = base.select(F.col(id_col), F.col("_sig").alias("_bucket"))
        batch_hits = (
            a.join(b, "_bucket")
            .where(F.col("_a") < F.col(id_col))
            .groupBy(id_col)
            .agg(F.count_distinct("_a").alias("n_batch_partners"))
        )
        report = (
            base.select(id_col)
            .join(idx_hits, id_col, "left")
            .join(batch_hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_index_buckets", F.lit(0)).alias(
                    "n_index_buckets"
                ),
                F.coalesce("n_batch_partners", F.lit(0)).alias(
                    "n_batch_partners"
                ),
            )
            .withColumn(
                "is_neardup",
                (F.col("n_index_buckets") > 0)
                | (F.col("n_batch_partners") > 0),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        report.write.mode("overwrite").partitionBy("batch_id").parquet(out_path)
        (
            base.select("_sig")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(index_path)
        )

    return foreach_batch_sink(
        df,
        flag_batch,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )
