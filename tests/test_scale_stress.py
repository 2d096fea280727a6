"""sf0.1 scale-stress differentials for the dedup/ANN tier.

The driver's oracle gate runs at sf0.01; bucket skew, LSH recall cliffs,
and candidate-volume blowups surface an order of magnitude later. This
suite re-runs the Spark-vs-DuckDB differential for the LSH/ANN/cluster
queries at sf0.1 (5k docs / 5k vectors) behind the ``slow`` marker —
``pytest -m "not slow"`` skips it for quick iteration; the full run keeps
it green.
"""

from __future__ import annotations

import os

import pytest

from kafkastreamingetl_spark.oracle import run_compare

SF_STRESS = "/root/testdata/sf0.1"

# The queries whose cost/skew profile changes qualitatively with scale:
# banded self-joins (candidate volume), iterative closure (cluster count),
# bucketed ANN (bucket occupancy), and the composed pipeline.
STRESS_QUERIES = [
    "minhash_signatures",
    "neardup_candidates",
    "neardup_pairs_jaccard",
    "simhash_candidates",
    "neardup_clusters",
    "dedup_documents_neardup",
    "training_set_sample",
    "embedding_topk",
    "embedding_ann_topk",
    "embedding_ann_multiprobe",
    "embedding_ivf_topk",
    # round-3 additions whose output volume scales superlinearly with the
    # input: pair-join density (attribution), chunk fan-out, term-space size
    "purchase_attribution",
    "doc_chunks",
    "tfidf_top_terms",
    "neardup_pairs_containment",
    "embedding_pq_topk",
    # round-6 additions: k-means training replays 2 full Lloyd's rounds in
    # BOTH engines (centroid drift and empty-cluster handling are
    # scale-dependent); the tokenizer's recursive-CTE twin walks 10× the
    # docs at 10× the row count
    "kmeans_centroids",
    "embedding_ivf_kmeans_topk",
    "embedding_pq_kmeans_topk",
    "doc_vocab_token_counts",
    # cross-set joins whose candidate volume scales with corpus size
    "eval_contamination",
    "incremental_dedup_documents",
    "embedding_int8_topk",
    # round-6 additions: gram explosion volume (hot spans), per-shingle
    # doc-frequency join density, estimator over the grown candidate set,
    # and the kmeans-model sample at 10× the cluster occupancy
    "hot_ngrams",
    "dup_ngram_doc_fraction",
    "minhash_jaccard_estimate",
    "cluster_balanced_sample",
    # semantic dedup: cluster count and closure depth grow with corpus
    "embedding_clusters",
    "dedup_embeddings_semantic",
    # scan/join-heavy OLAP + reshape additions at 10× the fact rows
    "pricing_summary",
    "top_revenue_orders",
    "orders_above_customer_avg",
    "daily_dense_series",
    "strip_boilerplate",
    "customer_order_distribution",
    "late_order_priority",
    "events_column_profile",
    # temporal / incremental / linkage / layout classes: history row
    # volume, as-of union length, ×16 join amplification, block density,
    # global ntile frame, and rank-window occupancy all grow 10×
    "scd2_event_type_history",
    "campaign_attribution_scd2",
    "user_daily_streaks",
    "user_value_ewma",
    "incremental_daily_rollup",
    "user_snapshot_diff",
    "entity_match_suppliers",
    "events_zorder_layout",
    "winsorized_type_stats",
    "corpus_shuffle_shards",
    # gram-volume (repetition profile), day-grid OLS terms, and the ×7
    # rolling-reach fan-out all scale with the input
    "doc_repetition_stats",
    "daily_value_trend",
    "rolling_distinct_users",
    "event_transition_matrix",
    "token_budget_sample",
    # round-7 additions: rank-exchange occupancy (exact ntile), prefilter
    # false-positive density, closure size histogram, per-stratum window
    # occupancy, and day-grid × span volume all grow with the input
    "user_ltv_deciles",
    "bloom_prefilter_join",
    "latest_user_state",
    "neardup_cluster_sizes",
    "stratified_language_sample",
    "orders_pending_backlog",
    "semantic_eval_contamination",
    "recursive_daily_series",
    # round-9 additions: first-occurrence scan volume (novelty), vocab-cut
    # stability at 10× the token stream (OOV), per-label cell occupancy
    "doc_ngram_novelty",
    "doc_oov_rate",
    "embedding_label_drift",
    # positioned-gram match density and per-diagonal island occupancy grow
    # with corpus duplication; the weighted top-k heap merge is k-sized but
    # its candidate stream is the whole corpus
    "substring_run_pairs",
    "weighted_doc_sample",
    "hard_negative_topk",
    # round-9 late additions: snapshot-diff join at 10× the doc volume,
    # the bucketed layout rebuilt over 10× the fact rows, MG candidate
    # behavior at 10× the token stream, the cluster closure consumed by
    # the split/disposition lanes at 10× the duplicate graph, per-user
    # window occupancy, and the CUSUM day grid
    "corpus_snapshot_diff",
    "bucketed_order_rollup",
    "frequent_tokens_sketch",
    "leakage_free_split",
    "dedup_disposition",
    "next_event_training_pairs",
    "daily_volume_cusum",
]

pytestmark = pytest.mark.slow


@pytest.mark.skipif(
    not os.path.isdir(SF_STRESS), reason="sf0.1 testdata not present"
)
def test_dedup_ann_tier_matches_oracle_at_sf01(spark):
    results = run_compare(spark, SF_STRESS, STRESS_QUERIES)
    assert len(results) == len(STRESS_QUERIES)
    failures = [str(r) for r in results if not r.ok]
    assert not failures, "\n".join(failures)
    # the tier must actually produce work at this scale, not vacuous greens
    assert all(r.rows_spark > 0 for r in results)
