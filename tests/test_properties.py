"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures (SURVEY.md §5 strategy extension).

Examples are kept small (Spark job per example); the properties target the
operators whose correctness is an algebraic claim: dedup idempotence and
survivor laws, session-window partitioning laws, salted-agg equivalence.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.cleaning import clean_events
from kafkastreamingetl_spark.operators.dedup import exact_dedup
from kafkastreamingetl_spark.operators.windows import session_agg

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_rows = st.lists(
    st.tuples(
        st.integers(0, 20),                      # event_id (forced collisions)
        st.integers(0, 3_600),                   # ts offset seconds
        st.integers(0, 5),                       # user_id
        st.sampled_from(["a", " A ", "B", None]),  # messy event_type
        st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
    ),
    min_size=1,
    max_size=40,
)


def _events_df(spark, rows):
    df = spark.createDataFrame(
        [
            (eid, f"2024-01-01 00:{off // 60:02d}:{off % 60:02d}", uid, et, v, "{}")
            for eid, off, uid, et, v in [
                (e, min(o, 3599), u, t, v) for e, o, u, t, v in rows
            ]
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


@SLOW
@given(rows=events_rows)
def test_clean_events_laws(spark, rows):
    df = _events_df(spark, rows)
    out = clean_events(df)
    pdf = out.toPandas()
    # law 1: one row per key
    assert pdf.event_id.is_unique
    # law 2: no nulls in filled/normalized columns
    assert pdf.value.notna().all() and pdf.event_type_norm.notna().all()
    # law 3: idempotence — cleaning cleaned data changes nothing
    again = clean_events(out.drop("event_type_norm")).toPandas()
    assert len(again) == len(pdf)
    # law 4: normalization is canonical (trim+lower fixpoint)
    assert (pdf.event_type_norm == pdf.event_type_norm.str.strip().str.lower()).all()


docs_rows = st.lists(
    st.tuples(
        st.integers(0, 10),
        st.text(alphabet="ab c", min_size=0, max_size=30),
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(rows=docs_rows)
def test_exact_dedup_laws(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).toPandas()
    src = df.toPandas()
    # law 1: one survivor per distinct text, and it is the min doc_id
    expected = src.groupby("text", dropna=False).doc_id.min().sort_values()
    assert sorted(out.doc_id) == sorted(expected)
    # law 2: idempotence
    assert len(exact_dedup(exact_dedup(df)).toPandas()) == len(out)


@SLOW
@given(
    offsets=st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
    gap_s=st.integers(60, 1_800),
)
def test_session_agg_laws(spark, offsets, gap_s):
    df = spark.createDataFrame(
        [(i, o) for i, o in enumerate(offsets)], "event_id long, off long"
    ).select(
        F.lit(1).alias("user_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("off")))
        .alias("ts"),
        F.lit(1.0).alias("value"),
    )
    sessions = session_agg(df, gap=f"{gap_s} seconds").toPandas()
    # law 1: events are partitioned — session sizes sum to input size
    assert sessions.n_events.sum() == len(offsets)
    # law 2: sessions don't overlap and are separated by >= gap
    s = sessions.sort_values("session_start")
    starts = s.session_start.tolist()
    ends = s.session_end.tolist()
    for (e_prev, s_next) in zip(ends[:-1], starts[1:]):
        assert s_next >= e_prev
    # law 3: every session spans [first_event, last_event + gap]
    assert (
        (s.session_end - s.session_start).dt.total_seconds() >= gap_s - 1e-6
    ).all()
