"""The production approximate paths are real, run, and land near exact.

Oracle queries use exact distinct/percentile so DuckDB can hash-match; at
100 TB the documented swaps are HyperLogLog++ (approx_count_distinct) and
t-digest (approx_percentile). These tests run the approximate variants and
bound their error against the exact answers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.catalog import load_table
from kafkastreamingetl_spark.operators.rollup import daily_aggregate
from kafkastreamingetl_spark.operators.windows import windowed_agg


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer")


def test_windowed_agg_hll_within_tolerance(spark, events):
    exact = {
        (r.window_start, r.event_type): r.unique_users
        for r in windowed_agg(events, window="6 hours", keys=["event_type"]).collect()
    }
    approx = windowed_agg(
        events, window="6 hours", keys=["event_type"], approx_distinct=True
    ).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[(r.window_start, r.event_type)]
        assert abs(r.unique_users - e) <= max(2, 0.1 * e), (r, e)


def test_daily_aggregate_hll_within_tolerance(spark, events, customer):
    exact = {
        (r.event_date, r.event_type, r.segment): r.daily_events
        for r in daily_aggregate(events, customer).collect()
    }
    approx = daily_aggregate(events, customer, approx_distinct=True).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[(r.event_date, r.event_type, r.segment)]
        assert abs(r.daily_events - e) <= max(2, 0.1 * e)


def test_approx_percentile_within_tolerance(spark, events):
    exact = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.95)).alias("p95")
    )
    approx = events.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.95), F.lit(1000)).alias("p95a")
    )
    joined = exact.join(approx, "event_type").collect()
    assert joined
    for r in joined:
        assert abs(r.p95a - r.p95) <= 0.05 * abs(r.p95) + 1e-9


def test_percentile_filter_approx_near_exact(spark, sf_dir):
    """The sketch-cutoff variant keeps nearly the same document set as the
    exact per-language window: symmetric difference bounded by sketch
    error at the quartile boundary."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    exact = {
        r.doc_id for r in QUERIES["quality_percentile_filter"](spark, sf_dir).collect()
    }
    approx = {
        r.doc_id
        for r in APPROX_VARIANTS["quality_percentile_filter_approx"](
            spark, sf_dir
        ).collect()
    }
    assert len(exact) > 0
    sym = len(exact ^ approx)
    assert sym <= max(5, 0.05 * len(exact)), (len(exact), len(approx), sym)


def test_zscore_single_pass_matches_exact_rows(spark, sf_dir):
    """var_pop differs from the decimal sum-of-squares only in float
    accumulation order; the anomaly SET at a 2.5-sigma cutoff must agree
    except for values sitting within ulps of the boundary."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    exact = {
        r.event_id for r in QUERIES["events_zscore_anomalies"](spark, sf_dir).collect()
    }
    single = {
        r.event_id
        for r in APPROX_VARIANTS["events_zscore_single_pass"](spark, sf_dir).collect()
    }
    assert len(exact) > 0
    assert len(exact ^ single) <= max(1, 0.01 * len(exact))


def test_rolling_distinct_hll_within_tolerance(spark, sf_dir):
    """The sketch-merge rolling-reach lane lands within HLL tolerance of
    the exact bounded-explode lane on every anchor day."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    exact = {
        r.anchor: r.n_users_7d
        for r in QUERIES["rolling_distinct_users"](spark, sf_dir).collect()
    }
    approx = APPROX_VARIANTS["rolling_distinct_users_hll"](
        spark, sf_dir
    ).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[r.anchor]
        assert abs(r.n_users_7d - e) <= max(2, 0.1 * e), (r.anchor, r.n_users_7d, e)


def test_winsorized_approx_near_exact(spark, sf_dir):
    """The t-digest threshold lane lands near the exact rank-based lane:
    winsorized means within 5% per type, clip counts within 10% of n."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    exact = {
        r.event_type: r
        for r in QUERIES["winsorized_type_stats"](spark, sf_dir).collect()
    }
    approx = APPROX_VARIANTS["winsorized_type_stats_approx"](
        spark, sf_dir
    ).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[r.event_type]
        assert r.n == e.n
        assert abs(r.winsorized_mean - e.winsorized_mean) <= 0.05 * abs(
            e.winsorized_mean
        )
        assert abs(r.n_clipped - e.n_clipped) <= max(2, 0.1 * e.n)


def test_ltv_deciles_approx_near_exact(spark, sf_dir):
    """The percentile-edge decile lane (zero sorts) stays near the exact
    range-shuffled ntile lane: same user total, every decile's population
    within 15% of the exact equal split, decile value ranges ordered."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    exact = {
        r.decile: r for r in QUERIES["user_ltv_deciles"](spark, sf_dir).collect()
    }
    approx = sorted(
        APPROX_VARIANTS["user_ltv_deciles_approx"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    n_total = sum(r.n_users for r in exact.values())
    assert sum(r.n_users for r in approx) == n_total
    assert {r.decile for r in approx} <= set(range(1, 11))
    target = n_total / 10
    for r in approx:
        assert abs(r.n_users - target) <= max(3, 0.15 * target), (
            r.decile,
            r.n_users,
            target,
        )
    # buckets are genuine value ranges: non-overlapping and ascending
    for lo, hi in zip(approx, approx[1:]):
        assert lo.max_ltv <= hi.min_ltv


def test_source_overlap_minhash_near_exact(spark, sf_dir):
    """The k=64 MinHash agreement fraction lands within the estimator's
    statistical envelope of the exact shingle Jaccard (stderr ~0.06 at
    J=0.5; bound 0.2 = >3 sigma) for every source pair the exact lane
    reports, and near zero for pairs the exact lane omits (omission means
    disjoint). Also structural: the sketch reports ALL pairs."""
    from kafkastreamingetl_spark.operators.dedup import (
        source_overlap,
        source_overlap_minhash,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.source_a, r.source_b): r.jaccard
        for r in source_overlap(docs).collect()
    }
    est = {
        (r.source_a, r.source_b): r.jaccard_est
        for r in source_overlap_minhash(docs).collect()
    }
    n_sources = docs.filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    ).select("source").distinct().count()
    assert len(est) == n_sources * (n_sources - 1) // 2
    assert set(exact) <= set(est)
    for pair, j_est in est.items():
        j = exact.get(pair, 0.0)
        assert abs(j_est - j) <= 0.2, (pair, j_est, j)


def test_rfm_approx_near_exact(spark, sf_dir):
    """The sketch-cut RFM lane: the census partitions the same user
    population (totals preserved, buckets in 1..4), and on the
    near-unique monetary dimension the per-user bucket agrees with the
    exact quartile cut for >= 90% of users (disagreement concentrates at
    the sketch's edge error; frequency's small-integer tie mass is the
    documented divergence and is not asserted)."""
    from pyspark.sql import Window

    from kafkastreamingetl_spark.queries import (
        APPROX_VARIANTS,
        QUERIES,
        _rfm_user_base,
    )

    exact_census = QUERIES["user_rfm_segments"](spark, sf_dir).collect()
    approx_census = APPROX_VARIANTS["user_rfm_segments_approx"](
        spark, sf_dir
    ).collect()
    n_exact = sum(r.n_users for r in exact_census)
    n_approx = sum(r.n_users for r in approx_census)
    assert n_exact == n_approx > 0
    for r in approx_census:
        assert {r.r_bucket, r.f_bucket, r.m_bucket} <= {1, 2, 3, 4}

    # per-user monetary bucket: exact ntile (test-only unpartitioned
    # window, small data) vs the sketch's threshold cut
    u = _rfm_user_base(spark, sf_dir)
    exact_m = u.select(
        "user_id",
        F.ntile(4)
        .over(Window.orderBy(F.asc("ltv"), F.asc("user_id")))
        .alias("m_exact"),
    )
    cuts = u.agg(
        F.approx_percentile(
            F.col("ltv").cast("double"),
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            F.lit(10000),
        ).alias("_mc")
    )
    approx_m = u.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        (
            F.lit(1)
            + sum(
                (
                    F.col("ltv").cast("double")
                    > F.element_at(F.col("_mc"), i + 1)
                ).cast("int")
                for i in range(3)
            )
        ).alias("m_approx"),
    )
    joined = exact_m.join(approx_m, "user_id")
    n = joined.count()
    n_agree = joined.filter(F.col("m_exact") == F.col("m_approx")).count()
    assert n_agree / n >= 0.9, (n_agree, n)


def test_source_overlap_minhash_single_source_and_null_edges(spark):
    """A single-source corpus has zero pairs (not a crash, not a
    self-pair); null text/source rows are excluded like the exact lane."""
    from kafkastreamingetl_spark.operators.dedup import source_overlap_minhash

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "web"),
            (2, None, "web"),
            (3, "alpha beta gamma delta", None),
        ],
        "doc_id long, text string, source string",
    )
    assert source_overlap_minhash(docs).count() == 0


def test_source_overlap_minhash_identical_sources_estimate_one(spark):
    """Two sources with identical shingle sets agree on every signature
    component: jaccard_est == 1.0 exactly (min over equal sets is equal)."""
    from kafkastreamingetl_spark.operators.dedup import source_overlap_minhash

    text = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, text, "a"), (2, text, "b")],
        "doc_id long, text string, source string",
    )
    rows = source_overlap_minhash(docs).collect()
    assert len(rows) == 1
    assert rows[0].jaccard_est == 1.0 and rows[0].n_agree == 64


def test_lm_bucket_mix_approx_near_exact(spark, sf_dir):
    """The sketch-cut CCNet bucket lane: same doc population as the exact
    rank-tertile lane, buckets from the label set, and per-doc agreement
    >= 80% (the LM scores are near-unique doubles so the sketch's only
    error source is edge placement; the testdata's one dominant language
    makes each tertile large enough that edge error stays local)."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS, QUERIES

    exact = {
        r.doc_id: r for r in QUERIES["lm_score_bucket_mix"](spark, sf_dir).collect()
    }
    approx = {
        r.doc_id: r
        for r in APPROX_VARIANTS["lm_bucket_mix_approx"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx) and exact
    assert {r.bucket for r in approx.values()} <= {"head", "middle", "tail"}
    # scores are identical (same LM); only the cut can differ
    for d in exact:
        assert exact[d].avg_nll_micro == approx[d].avg_nll_micro
    agree = sum(1 for d in exact if exact[d].bucket == approx[d].bucket)
    assert agree / len(exact) >= 0.80, f"{agree}/{len(exact)}"
    # each language's head share stays near a third
    import collections

    by_lang = collections.defaultdict(lambda: collections.Counter())
    for r in approx.values():
        by_lang[r.lang][r.bucket] += 1
    for lang, c in by_lang.items():
        n = sum(c.values())
        if n >= 30:
            assert 0.2 <= c["head"] / n <= 0.5, (lang, dict(c))
