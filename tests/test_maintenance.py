"""Small-file compaction: fewer files, identical rows, untouched partitions
preserved, already-compact partitions left alone."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.maintenance import (
    compact_partitions,
    partition_file_stats,
)
from kafkastreamingetl_spark.sources import synthetic_events_batch


def _n_files(path, part):
    d = os.path.join(path, f"event_date={part}")
    return len([f for f in os.listdir(d) if f.endswith(".parquet")])


@pytest.fixture()
def fragmented_lake(spark, tmp_path):
    """Two date partitions, each shattered into ~20 small files (the shape
    a 30 s-trigger streaming sink leaves behind)."""
    path = str(tmp_path / "lake")
    ev = synthetic_events_batch(spark, 3_000, seed=7).withColumn(
        # the generator spans ~25 min; spread rows across two dates so the
        # lake has multiple partitions
        "event_date",
        F.date_add(F.to_date("ts"), (F.col("user_id") % 2).cast("int")),
    )
    ev.repartition(20).write.partitionBy("event_date").parquet(path)
    return path


def test_compaction_reduces_files_keeps_rows(spark, fragmented_lake):
    path = fragmented_lake
    before = spark.read.parquet(path)
    rows_before = sorted(
        tuple(r) for r in before.drop("event_date").collect()
    )
    parts = sorted(
        r[0] for r in partition_file_stats(spark, path, "event_date").collect()
    )
    assert all(_n_files(path, p) > 1 for p in parts)

    written = compact_partitions(spark, path, "event_date")
    assert set(written) == set(parts)
    for p in parts:
        assert _n_files(path, p) == written[p] == 1  # tiny data: one file

    after = spark.read.parquet(path)
    rows_after = sorted(tuple(r) for r in after.drop("event_date").collect())
    assert rows_after == rows_before  # compaction is a content no-op


def test_compaction_is_selective(spark, fragmented_lake):
    """Compacting one named partition leaves the other's files untouched."""
    path = fragmented_lake
    parts = sorted(
        r[0] for r in partition_file_stats(spark, path, "event_date").collect()
    )
    assert len(parts) >= 2
    target, other = parts[0], parts[1]
    other_files = set(os.listdir(os.path.join(path, f"event_date={other}")))

    compact_partitions(spark, path, "event_date", [target])
    assert _n_files(path, target) == 1
    assert (
        set(os.listdir(os.path.join(path, f"event_date={other}"))) == other_files
    )


def test_sorted_compaction_tightens_file_stats(spark, fragmented_lake):
    """sort_cols clustering: after compaction the output files' min/max
    ranges on the sort column are disjoint — a point lookup then prunes
    to one file via footer stats instead of scanning the partition."""
    import pyarrow.parquet as pq

    path = fragmented_lake
    parts = sorted(
        r[0] for r in partition_file_stats(spark, path, "event_date").collect()
    )
    compact_partitions(
        spark,
        path,
        "event_date",
        [parts[0]],
        sort_cols=["user_id"],
        max_records_per_file=300,
    )
    pdir = os.path.join(path, f"event_date={parts[0]}")
    ranges = []
    for f in sorted(os.listdir(pdir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(pdir, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(len(md.schema))}[
            "user_id"
        ]
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    assert len(ranges) > 1  # maxRecordsPerFile split the sorted partition
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint clustering ranges


def test_compaction_skips_already_compact(spark, tmp_path):
    path = str(tmp_path / "lake1")
    ev = synthetic_events_batch(spark, 200, seed=9).withColumn(
        "event_date", F.to_date("ts")
    )
    ev.coalesce(1).write.partitionBy("event_date").parquet(path)
    assert compact_partitions(spark, path, "event_date") == {}


def test_expire_partitions_dry_run_then_delete(spark, tmp_path):
    """Retention: dry run reports without deleting; the delete leg removes
    exactly the expired partition dirs and leaves retained rows intact."""
    from kafkastreamingetl_spark.operators.maintenance import expire_partitions

    path = str(tmp_path / "retained")
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 4) + 1:02d}", float(i)) for i in range(40)],
        "event_id long, event_date string, value double",
    )
    df.write.partitionBy("event_date").parquet(path)

    report = expire_partitions(
        spark, path, "event_date", keep_from="2024-01-03", dry_run=True
    )
    flags = {r.event_date: r.expired for r in report.collect()}
    assert flags == {
        "2024-01-01": True,
        "2024-01-02": True,
        "2024-01-03": False,
        "2024-01-04": False,
    }
    # dry run deleted nothing
    assert spark.read.parquet(path).count() == 40

    expire_partitions(
        spark, path, "event_date", keep_from="2024-01-03", dry_run=False
    )
    back = spark.read.parquet(path)
    assert back.count() == 20
    # partition discovery infers event_date as DATE on read-back
    assert set(
        str(r.event_date)
        for r in back.select("event_date").distinct().collect()
    ) == {"2024-01-03", "2024-01-04"}


def test_expire_partitions_refuses_non_iso_delete(spark, tmp_path):
    """The irreversible leg validates its ordering precondition: non-ISO
    partition values (or keep_from) under string comparison would expire
    the wrong directories, so the delete branch raises and nothing is
    removed. Dry-run reporting still works on any layout."""
    import pytest
    from kafkastreamingetl_spark.operators.maintenance import expire_partitions

    path = str(tmp_path / "noniso")
    df = spark.createDataFrame(
        [(i, f"{(i % 3) + 1:02d}-01-2024", float(i)) for i in range(30)],
        "event_id long, event_date string, value double",
    )
    df.write.partitionBy("event_date").parquet(path)

    # report-only is allowed (it is explicitly untrustworthy per docstring)
    expire_partitions(
        spark, path, "event_date", keep_from="02-01-2024", dry_run=True
    )
    with pytest.raises(ValueError, match="not an ISO date"):
        expire_partitions(
            spark, path, "event_date", keep_from="02-01-2024", dry_run=False
        )
    assert spark.read.parquet(path).count() == 30

    # ISO keep_from but non-ISO partition values: still refused
    with pytest.raises(ValueError, match="non-ISO partition values"):
        expire_partitions(
            spark, path, "event_date", keep_from="2024-01-02", dry_run=False
        )
    assert spark.read.parquet(path).count() == 30


def test_vacuum_tombstones_two_phase(spark, tmp_path):
    """Tombstone GC over an upsert-sink-shaped table: dry run reports
    without touching files; the delete leg removes ONLY tombstones older
    than the horizon, leaves live rows and younger tombstones, and keeps
    untouched partitions' files byte-identical."""
    import os

    from kafkastreamingetl_spark.operators.maintenance import (
        vacuum_tombstones,
    )

    table = str(tmp_path / "table")
    rows = spark.createDataFrame(
        [
            # d=2024-01-01: one old tombstone + one live row
            (1, "2024-01-01 10:00:00", 1.0, True, "2024-01-01"),
            (2, "2024-01-01 11:00:00", 2.0, False, "2024-01-01"),
            # d=2024-01-02: a YOUNG tombstone (inside horizon) survives
            (3, "2024-01-02 10:00:00", 3.0, True, "2024-01-02"),
            # d=2024-01-03: live only — partition must not be rewritten
            (4, "2024-01-03 10:00:00", 4.0, False, "2024-01-03"),
        ],
        "event_id long, ts string, value double, deleted boolean, d string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows.write.partitionBy("d").parquet(table)
    untouched_dir = os.path.join(table, "d=2024-01-03")
    before = sorted(os.listdir(untouched_dir))

    kw = dict(
        partition_col="d",
        delete_col="deleted",
        order_col="ts",
        older_than="2024-01-02 00:00:00",
    )
    # partition values come back type-inferred (DATE here)
    report = {
        str(r.d): r.n_vacuumed
        for r in vacuum_tombstones(spark, table, **kw).collect()
    }
    assert report == {"2024-01-01": 1}
    # dry run: nothing changed
    assert spark.read.parquet(table).count() == 4

    vacuum_tombstones(spark, table, dry_run=False, **kw)
    after = {r.event_id: r for r in spark.read.parquet(table).collect()}
    assert set(after) == {2, 3, 4}          # old tombstone physically gone
    assert after[3].deleted is True          # young tombstone retained
    assert sorted(os.listdir(untouched_dir)) == before  # untouched files
