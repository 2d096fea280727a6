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


# The driver's CORRECTNESS harness records the first ~50 dict entries per
# round, so ordering is part of the verification contract (no green row may
# age past ~4 rounds). Round-9 window: the 44 queries whose latest green
# row is round 5 (3 rounds stale — the reference-surface staples and the
# exact-ANN serving family, VERDICT r8 item 1) head the window; then the 3
# queries whose implementation changed this round (int64→decimal widening
# in the drift/TWAP/trend moment sums); then new round-9 registrations;
# the first of the 46 round-6 greens start rotating through the remaining
# slots (the rest rotate in round 10, becoming the only age-4 cohort).
_PRIORITY = [
    # latest green row is round 5 — 3 rounds stale, rotate (VERDICT r8 #1)
    # reference-surface staples first
    "clean_events",
    "windowed_agg_tumbling",
    "windowed_agg_sliding",
    "session_agg",
    "enrich_events",
    "daily_segment_metrics",
    "premium_rollup",
    "daily_metrics_run_date",
    "order_line_rollup",
    "top_segments",
    "json_decode",
    "json_roundtrip",
    "wire_normalize",
    "sql_projection",
    "sql_top_active_days",
    "literal_dim_enrich",
    "props_map_extract",
    "csv_wire_roundtrip",
    # analytics on events/orders
    "cohort_retention",
    "grouping_sets_activity",
    "active_customers",
    "daily_counts_unpivot",
    "events_last_purchase",
    "orphan_events",
    "purchase_attribution",
    "supplier_region_revenue",
    "type_stats_null_safe",
    "value_histogram",
    "value_percentiles",
    "value_quartiles_by_type",
    # exact-ANN serving family (oldest evidence in the package)
    "embedding_topk",
    "embedding_ann_topk",
    "embedding_ann_multiprobe",
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_label_centroids",
    "embedding_neardup_pairs",
    # near-dup verify lanes + multimodal + sampling
    "neardup_pairs_jaccard",
    "neardup_pairs_containment",
    "simhash_candidates",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "training_set_sample",
    # implementation changed in round 9: moment-sum operands widened to
    # decimal(19,0)/HUGEINT before the product (overflow fix, ADVICE r8)
    "events_value_drift",
    "time_weighted_value",
    "daily_value_trend",
    # round-6 greens begin rotating through the remaining slots (the rest
    # of that 46-query cohort rotates in round 10)
    "embedding_int8_topk",
    "embedding_ivf_kmeans_topk",
    "embedding_pq_kmeans_topk",
    # --- driver window boundary (~50) ---
    # ROUND-10 ROTATION PLAN: head the next window with the thirteen
    # round-9 registrations that have never earned a driver row
    # (doc_ngram_novelty, doc_oov_rate, embedding_label_drift,
    # substring_run_pairs, weighted_doc_sample, hard_negative_topk,
    # corpus_snapshot_diff, bucketed_order_rollup, frequent_tokens_sketch,
    # leakage_free_split, next_event_training_pairs, daily_volume_cusum,
    # dedup_disposition — never-green outranks stale-green), then fill
    # with the r6 cohort (oldest evidence first).
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLE_SQL))
