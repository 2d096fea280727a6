"""Takedown / opt-out blast-radius audit: per-table totals and affected
counts from a broadcast key set, one scan per table, read-only."""

from __future__ import annotations

from kafkastreamingetl_spark.operators.governance import takedown_impact


def test_multi_table_counts_hand_computed(spark):
    events = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 30), (5, None)],
        "event_id long, user_id long",
    )
    orders = spark.createDataFrame(
        [(100, 10), (101, 40)], "o_orderkey long, o_custkey long"
    )
    users = spark.createDataFrame([(10,), (20,), (30,), (40,)], "uid long")
    optout = spark.createDataFrame([(10,), (40,), (99,)], "k long")

    out = takedown_impact(
        {
            "events": (events, "user_id"),
            "orders": (orders, "o_custkey"),
            "users": (users, "uid"),
        },
        optout,
    )
    rows = {r.table_name: (r.rows_total, r.rows_affected) for r in out.collect()}
    assert rows == {
        "events": (5, 2),  # users 10,10 affected; NULL owner never matches
        "orders": (2, 2),  # custkeys 10 and 40
        "users": (4, 2),  # 10 and 40 exist; 99 matches nothing
    }


def test_duplicate_optout_keys_do_not_double_count(spark):
    events = spark.createDataFrame([(1, 10), (2, 20)], "event_id long, user_id long")
    optout = spark.createDataFrame([(10,), (10,), (10,)], "k long")
    out = takedown_impact({"events": (events, "user_id")}, optout).collect()[0]
    assert (out.rows_total, out.rows_affected) == (2, 1)


def test_audit_is_broadcast_and_single_scan(spark, sf_dir):
    """Plan shape: the opt-out side is broadcast (no fact shuffle for the
    join) and each fact table appears exactly once in the scan list."""
    from kafkastreamingetl_spark.queries import QUERIES

    df = QUERIES["takedown_sweep"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_takedown_counts_match_brute_force_seeded(spark):
    import random

    rng = random.Random(31)
    rows = [
        (i, rng.choice([None] + list(range(40)))) for i in range(500)
    ]
    keys = [rng.randrange(60) for _ in range(25)]  # dupes + misses likely
    expected = sum(1 for _i, u in rows if u is not None and u in set(keys))

    events = spark.createDataFrame(rows, "event_id long, user_id long")
    optout = spark.createDataFrame([(k,) for k in keys], "k long")
    out = takedown_impact({"events": (events, "user_id")}, optout).collect()[0]
    assert (out.rows_total, out.rows_affected) == (500, expected)


def test_kanon_risk_report_flags_small_cells(spark):
    from kafkastreamingetl_spark.operators.governance import kanon_risk_report

    # 6 docs share (en, srcA, bucket of length 7 = bucket 2); one doc is
    # alone in (de, srcB); one NULL-lang doc is its own cell.
    rows = [(i, "seven77", "en", "srcA") for i in range(6)]
    rows.append((6, "achtacht", "de", "srcB"))
    rows.append((7, "x", None, "srcB"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {(r.lang, r.source, r.len_bucket): r for r in kanon_risk_report(df).collect()}
    big = got[("en", "srcA", 2)]
    assert big.n_docs == 6 and big.at_risk is False
    lone = got[("de", "srcB", 3)]
    assert lone.n_docs == 1 and lone.at_risk is True
    nullcell = got[(None, "srcB", 0)]
    assert nullcell.n_docs == 1 and nullcell.at_risk is True
    # custom k: with k=7 even the big cell is at risk
    got7 = {
        (r.lang, r.source, r.len_bucket): r
        for r in kanon_risk_report(df, k=7).collect()
    }
    assert got7[("en", "srcA", 2)].at_risk is True


def test_kanon_bucket_is_integer_exact_at_power_edges(spark):
    from kafkastreamingetl_spark.operators.governance import kanon_risk_report

    # lengths 7 (bucket 2), 8 (bucket 3), 15 (bucket 3), 16 (bucket 4):
    # the bin-length rule can't flip at exact powers of two
    rows = [
        (0, "a" * 7, "en", "s"),
        (1, "a" * 8, "en", "s"),
        (2, "a" * 15, "en", "s"),
        (3, "a" * 16, "en", "s"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    buckets = {
        r.len_bucket: r.n_docs for r in kanon_risk_report(df).collect()
    }
    assert buckets == {2: 1, 3: 2, 4: 1}
