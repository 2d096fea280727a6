"""Quality-report rule semantics and funnel ordering on planted data."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.quality import quality_report
from kafkastreamingetl_spark.queries import QUERIES


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "props", F.lit("{}")
    )


def test_quality_report_counts_rules_in_one_row(spark):
    df = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, None, 5.0),
            (2, "2024-01-01 00:00:00", 2, "click", None),
            (3, "2024-01-01 00:00:00", 3, "view", 900.0),
            (3, "2024-01-01 00:01:00", 3, "view", 1.0),  # dup key
        ],
    )
    r = quality_report(
        df,
        {
            "null_type": F.col("event_type").isNull(),
            "big_value": F.col("value") > 500,
        },
    ).collect()[0]
    assert r.n_rows == 4 and r.null_type == 1 and r.big_value == 1


def test_funnel_requires_strict_stage_order(spark, tmp_path):
    # user 1: click -> view -> purchase (full funnel)
    # user 2: view BEFORE click, purchase after click but no view after
    #         click -> counts only for stage 1
    # user 3: view+purchase, never clicked -> counts nowhere
    df = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "click", 1.0),
            (2, "2024-01-01 00:01:00", 1, "view", 1.0),
            (3, "2024-01-01 00:02:00", 1, "purchase", 1.0),
            (4, "2024-01-01 00:00:00", 2, "view", 1.0),
            (5, "2024-01-01 00:01:00", 2, "click", 1.0),
            (6, "2024-01-01 00:02:00", 2, "purchase", 1.0),
            (7, "2024-01-01 00:00:00", 3, "view", 1.0),
            (8, "2024-01-01 00:01:00", 3, "purchase", 1.0),
        ],
    )
    sf_dir = str(tmp_path / "sf")
    df.write.parquet(f"{sf_dir}/events.parquet")
    got = {
        r.stage: r.n_users
        for r in QUERIES["conversion_funnel"](spark, sf_dir).collect()
    }
    assert got == {
        "click": 2,
        "view_after_click": 1,
        "purchase_after_view": 1,
    }


def test_run_corpus_refresh_end_to_end(spark, tmp_path):
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.pipeline import run_corpus_refresh

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    out = str(tmp_path / "refresh")

    counts = run_corpus_refresh(docs, emb, out)
    assert 0 < counts["corpus"] <= docs.count()
    assert counts["training_set"] > 0

    training = spark.read.parquet(f"{out}/training_set")
    assert set(r.split for r in training.select("split").distinct().collect()) <= {
        "train",
        "test",
    }
    # trainers read split=train via partition pruning; ranks stay per-label
    train = training.where(F.col("split") == "train")
    per_label = train.groupBy("label").count().collect()
    assert all(r["count"] <= 10 for r in per_label)
    # refresh is idempotent: rerun overwrites to the same counts
    assert run_corpus_refresh(docs, emb, out) == counts


def test_null_safe_join_matches_null_keys(spark, tmp_path):
    """The null-null match the driver testdata cannot exercise: rows with
    a null key must join to the null dim entry, not drop."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, None, 1.0),
            (2, "2024-01-01 00:01:00", 2, None, 2.0),
            (3, "2024-01-01 00:02:00", 3, "click", 3.0),
        ],
    )
    sf_dir = str(tmp_path / "sf")
    ev.write.parquet(f"{sf_dir}/events.parquet")
    got = {
        r.event_id: r.type_total
        for r in QUERIES["type_stats_null_safe"](spark, sf_dir).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1}  # null keys matched each other
