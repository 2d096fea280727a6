"""Operational job CLI: the scheduler-facing entry points as commands.

The reference's operational surface is an Airflow DAG invoking one batch
job (reference airflow/dags/kafka_spark_etl.py); this engine's equivalent
jobs are callables (rollup.run_daily_batch, pipeline.run_corpus_refresh,
maintenance.compact_partitions / expire_partitions). This module gives
each a CLI so ANY scheduler — cron, Airflow BashOperator, dagster shell
op — can run them without writing Python:

    python -m kafkastreamingetl_spark.jobs daily --sf-dir DIR --run-date 2024-01-15 [--out PATH]
    python -m kafkastreamingetl_spark.jobs corpus-refresh --sf-dir DIR --out PATH
    python -m kafkastreamingetl_spark.jobs compact --path PATH --partition-col COL
    python -m kafkastreamingetl_spark.jobs expire --path PATH --partition-col COL --keep-from VALUE [--delete]
    python -m kafkastreamingetl_spark.jobs vacuum-tombstones --path PATH --partition-col COL --older-than TS [--delete]
    python -m kafkastreamingetl_spark.jobs kafka-smoke [--bootstrap HOST:9092] [--n-events N]
    python -m kafkastreamingetl_spark.jobs neardup-ingest --index PATH --batch PARQUET [--out PATH] [--min-jaccard J]

Each command prints ONE JSON result line on stdout (row counts / files
written / partitions expired) — the machine-readable contract a
scheduler's sensor or log parser consumes — and exits nonzero on
failure, which is all an external orchestrator needs for retry/alerting
semantics. Scheduling itself (cron expressions, backfills, catchup)
stays in the scheduler: the X5 boundary SURVEY.md draws.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from .session import get_test_spark

    return get_test_spark(app)


def cmd_daily(args: argparse.Namespace) -> dict:
    from .catalog import load_events, load_table
    from .operators.rollup import run_daily_batch

    spark = _spark("job_daily")
    events = load_events(spark, args.sf_dir)
    customer = load_table(spark, args.sf_dir, "customer")
    n = run_daily_batch(events, customer, args.run_date, args.out)
    return {"job": "daily", "run_date": args.run_date, "rows": n}


def cmd_corpus_refresh(args: argparse.Namespace) -> dict:
    from .catalog import load_table
    from .operators.pipeline import run_corpus_refresh

    spark = _spark("job_corpus_refresh")
    docs = load_table(spark, args.sf_dir, "documents")
    emb = load_table(spark, args.sf_dir, "embeddings")
    counts = run_corpus_refresh(docs, emb, args.out)
    return {"job": "corpus-refresh", **counts}


def cmd_compact(args: argparse.Namespace) -> dict:
    from .operators.maintenance import compact_partitions

    spark = _spark("job_compact")
    written = compact_partitions(spark, args.path, args.partition_col)
    return {"job": "compact", "partitions_rewritten": written}


def cmd_expire(args: argparse.Namespace) -> dict:
    from .operators.maintenance import expire_partitions

    spark = _spark("job_expire")
    report = expire_partitions(
        spark,
        args.path,
        args.partition_col,
        keep_from=args.keep_from,
        dry_run=not args.delete,
    )
    expired = sorted(
        r[args.partition_col] for r in report.collect() if r["expired"]
    )
    return {
        "job": "expire",
        "dry_run": not args.delete,
        "expired_partitions": expired,
    }


def cmd_vacuum_tombstones(args: argparse.Namespace) -> dict:
    from .operators.maintenance import vacuum_tombstones

    spark = _spark("job_vacuum_tombstones")
    report = vacuum_tombstones(
        spark,
        args.path,
        partition_col=args.partition_col,
        delete_col=args.delete_col,
        order_col=args.order_col,
        older_than=args.older_than,
        dry_run=not args.delete,
    )
    rows = report.collect()
    return {
        "job": "vacuum-tombstones",
        "dry_run": not args.delete,
        "partitions": {
            str(r[args.partition_col]): r["n_vacuumed"] for r in rows
        },
        "n_vacuumed": sum(r["n_vacuumed"] for r in rows),
    }


def cmd_kafka_smoke(args: argparse.Namespace) -> dict:
    """The Kafka runtime leg (S1/S8/T7) as a one-command probe. With no
    broker configured it SKIPS CLEANLY (exit 0, status=skipped) — the gap
    stays visible but a broker-less scheduler run is not an error; with
    ``--bootstrap`` or SPARK_GRAFT_KAFKA_BOOTSTRAP set it runs the real
    produce→consume→replay loop and fails loudly on any mismatch or on a
    missing spark-sql-kafka connector jar."""
    import os

    bootstrap = args.bootstrap or os.getenv("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        return {
            "job": "kafka-smoke",
            "status": "skipped",
            "reason": (
                "no broker: pass --bootstrap host:9092 or set "
                "SPARK_GRAFT_KAFKA_BOOTSTRAP (the session also needs the "
                "spark-sql-kafka-0-10 connector jar on its classpath, e.g. "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
            ),
        }
    from .streaming import kafka_round_trip_smoke

    spark = _spark("job_kafka_smoke")
    result = kafka_round_trip_smoke(spark, bootstrap, n_events=args.n_events)
    if not result["ok"]:
        raise RuntimeError(f"kafka round trip mismatch: {result}")
    return {"job": "kafka-smoke", "status": "ok", **result}


def cmd_neardup_ingest(args: argparse.Namespace) -> dict:
    """The daily near-dup ingest loop as one scheduler command: dedup a
    new document batch against the persisted signature index
    (dedup.build_neardup_index layout), optionally append survivors to a
    corpus directory, and write the survivors' own signatures/features
    back to the index so tomorrow's batch dedups against today's accepted
    corpus. First run bootstraps: within-batch near-dup dedup only, then
    the index is born from the survivors. The base corpus is never
    rescanned — per-day cost tracks the batch size (dedup.py
    incremental_neardup_from_index / append_neardup_index)."""
    import os

    from .operators.dedup import (
        NEARDUP_MIN_JACCARD,
        append_neardup_index,
        build_neardup_index,
        incremental_neardup_from_index,
        neardup_dedup,
    )

    spark = _spark("job_neardup_ingest")
    mj = (
        NEARDUP_MIN_JACCARD if args.min_jaccard is None else args.min_jaccard
    )
    batch = spark.read.parquet(args.batch)
    n_in = batch.count()
    bootstrap = not os.path.exists(os.path.join(args.index, "sigs"))
    if bootstrap:
        survivors = neardup_dedup(batch, min_jaccard=mj)
    else:
        survivors = incremental_neardup_from_index(
            spark, args.index, batch, min_jaccard=mj
        )
    # Eager localCheckpoint, not persist: the index append below writes to
    # the very path the survivors' lineage reads, and Spark's post-write
    # refreshByPath drops any cache whose plan touches that path — a
    # persisted survivors would silently recompute against the UPDATED
    # index (colliding with its own signatures → empty corpus append).
    # Truncating the lineage pins the survivor set once, batch-sized.
    survivors = survivors.localCheckpoint(eager=True)
    n_out = survivors.count()
    # Index FIRST, corpus second (ADVICE r11): if the corpus append fails
    # after the index write, the corpus is merely missing one day's rows —
    # visible (row counts disagree with the index) and repairable. The
    # reverse order corrupts silently and permanently: corpus rows the
    # index cannot see mean later batches' near-dups survive forever.
    if bootstrap:
        build_neardup_index(survivors, args.index)
    else:
        append_neardup_index(survivors, args.index)
    if args.out:
        survivors.write.mode("append").parquet(args.out)
    return {
        "job": "neardup-ingest",
        "batch_rows": n_in,
        "survivors": n_out,
        "bootstrapped": bootstrap,
    }


def cmd_contamination_diff(args: argparse.Namespace) -> dict:
    """The nightly contamination gate as one scheduler command: report
    what a new document batch drags in against the accreted hash+gram
    index (exact re-crawls + 13-gram verbatim passages), then append the
    batch's own hashes/distinct grams so tomorrow's batch is checked
    against today's. The same ``contamination_report`` assembly the
    registered batch operator and the streaming sink run; index layout
    matches ``streaming.contamination_diff_sink`` (hashes/, grams/) with
    a day tag in place of batch_id. Index FIRST, report second — the
    repairable crash direction (a report missing one day regenerates
    from the index; an index missing a day's grams silently under-flags
    forever after).

    Replay discipline mirrors the streaming sink's strictly-earlier
    probe (ADVICE r13): index reads exclude ``day >= args.day``, so
    re-running a crashed day never checks the batch against its own
    half-written partition (every doc would self-flag as exact_dup), and
    backfilling an older day never checks it against later days' data.
    Index existence is probed by READING (AnalysisException = bootstrap),
    not os.path.exists — a crash between the hashes and grams writes
    leaves hashes/ present and grams/ missing, which must bootstrap the
    gram lane instead of wedging the nightly gate; a path-string check
    also mis-bootstraps on any non-local filesystem.

    BROADCAST-DIRECTION CONTRACT: the batch's hash/gram sets are
    broadcast to the index side, so the batch must be ingest-sized
    (one day's crawl), never a backfill of months — ``--max-batch-docs``
    (default 2,000,000) fails the job loudly before the broadcast can
    OOM an executor; 0 disables for callers who have re-checked the
    direction."""
    import os

    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from .operators.dedup import NGRAM_CONTAM_N, contamination_report
    from .operators.text import shingle_hashes

    spark = _spark("job_contamination_diff")
    batch = spark.read.parquet(args.batch)
    text = F.coalesce(F.col("text"), F.lit(""))
    proj = batch.select(
        F.col("doc_id"),
        F.md5(text).alias("_h"),
        shingle_hashes(text, NGRAM_CONTAM_N).alias("_g"),
    ).localCheckpoint(eager=True)  # index append below touches read paths
    n_in = proj.count()
    if args.max_batch_docs and n_in > args.max_batch_docs:
        # RuntimeError, not SystemExit: main()'s scheduler contract turns
        # job exceptions into exit code 1 + one stderr line
        raise RuntimeError(
            f"batch has {n_in} docs > --max-batch-docs "
            f"{args.max_batch_docs}: this gate BROADCASTS the batch's "
            "hash/gram sets (the index side never shuffles) — point it at "
            "one ingest day, not a backfill, or raise/disable the guard "
            "deliberately"
        )

    h_path = os.path.join(args.index, "hashes")
    g_path = os.path.join(args.index, "grams")

    def _read_index(path: str, col: str):
        """Strictly-earlier index slice, or None when the side does not
        exist yet (bootstrap-for-that-side)."""
        try:
            df = spark.read.parquet(path).where(
                F.col("day") < F.lit(args.day)
            )
            return None if df.limit(1).isEmpty() else df.select(col)
        except AnalysisException:
            return None

    idx_h = _read_index(h_path, "_h")
    idx_g = _read_index(g_path, "g")
    bootstrap = idx_h is None
    if bootstrap:
        report = proj.select(
            "doc_id",
            F.size("_g").cast("bigint").alias("n_grams"),
            F.lit(False).alias("exact_dup"),
            F.lit(0).cast("bigint").alias("n_gram_collisions"),
            F.lit(False).alias("contaminated"),
        )
    else:
        if idx_g is None:
            # hashes written, grams crash-lost: bootstrap the gram lane
            idx_g = spark.createDataFrame([], "g bigint")
        report = contamination_report(proj, idx_h, idx_g)
    report = report.withColumn("day", F.lit(args.day)).localCheckpoint(
        eager=True
    )
    n_bad = report.where("contaminated").count()
    (
        proj.select("doc_id", "_h")
        .withColumn("day", F.lit(args.day))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(h_path)
    )
    (
        proj.select(F.explode("_g").alias("g"))
        .distinct()
        .withColumn("day", F.lit(args.day))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(g_path)
    )
    report.write.mode("overwrite").partitionBy("day").parquet(args.out)
    return {
        "job": "contamination-diff",
        "batch_rows": n_in,
        "contaminated": n_bad,
        "bootstrapped": bootstrap,
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="kafkastreamingetl_spark.jobs")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("daily", help="X2 daily rollup batch")
    d.add_argument("--sf-dir", required=True)
    d.add_argument("--run-date", required=True)
    d.add_argument("--out", default=None)
    d.set_defaults(fn=cmd_daily)

    c = sub.add_parser("corpus-refresh", help="training-corpus refresh")
    c.add_argument("--sf-dir", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_corpus_refresh)

    k = sub.add_parser("compact", help="small-file compaction")
    k.add_argument("--path", required=True)
    k.add_argument("--partition-col", required=True)
    k.set_defaults(fn=cmd_compact)

    e = sub.add_parser("expire", help="partition retention")
    e.add_argument("--path", required=True)
    e.add_argument("--partition-col", required=True)
    e.add_argument("--keep-from", required=True)
    e.add_argument("--delete", action="store_true")
    e.set_defaults(fn=cmd_expire)

    v = sub.add_parser(
        "vacuum-tombstones",
        help="upsert-table tombstone GC past the lateness horizon "
        "(dry run unless --delete)",
    )
    v.add_argument("--path", required=True)
    v.add_argument("--partition-col", required=True)
    v.add_argument("--delete-col", default="deleted")
    v.add_argument("--order-col", default="ts")
    v.add_argument("--older-than", required=True)
    v.add_argument("--delete", action="store_true")
    v.set_defaults(fn=cmd_vacuum_tombstones)

    n = sub.add_parser(
        "neardup-ingest",
        help="daily near-dup dedup of a document batch against the "
        "persisted index, with survivor append-back",
    )
    n.add_argument("--index", required=True)
    n.add_argument("--batch", required=True)
    n.add_argument("--out", default=None)
    n.add_argument("--min-jaccard", type=float, default=None)
    n.set_defaults(fn=cmd_neardup_ingest)

    cd = sub.add_parser(
        "contamination-diff",
        help="nightly contamination gate: batch vs accreted hash+gram "
        "index, report + index append-back. The batch side is BROADCAST "
        "(ingest-sized by contract): point it at one day's crawl, never "
        "a multi-month backfill — see --max-batch-docs",
    )
    cd.add_argument("--index", required=True)
    cd.add_argument("--batch", required=True)
    cd.add_argument("--out", required=True)
    cd.add_argument(
        "--day",
        required=True,
        help="ISO date tag for this batch; index probes read strictly "
        "EARLIER days only, so replays self-heal and backfills never "
        "compare against the future",
    )
    cd.add_argument(
        "--max-batch-docs",
        type=int,
        default=2_000_000,
        help="fail loudly when the batch exceeds this many docs (its "
        "hash/gram sets broadcast to the index side); 0 disables",
    )
    cd.set_defaults(fn=cmd_contamination_diff)

    s = sub.add_parser(
        "kafka-smoke",
        help="S1/S8/T7 runtime probe: produce -> consume -> replay "
        "(skips cleanly without a broker)",
    )
    s.add_argument("--bootstrap", default=None)
    s.add_argument("--n-events", type=int, default=200)
    s.set_defaults(fn=cmd_kafka_smoke)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        result = args.fn(args)
    except Exception as e:  # noqa: BLE001 — the scheduler contract is exit code + stderr
        print(f"job failed: {type(e).__name__}: {e}", file=sys.stderr)
        return 1
    print(json.dumps(result, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
