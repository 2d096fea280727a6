"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures (SURVEY.md §5 strategy extension).

Examples are kept small (Spark job per example); the properties target the
operators whose correctness is an algebraic claim: dedup idempotence and
survivor laws, session-window partitioning laws, salted-agg equivalence.
"""

from __future__ import annotations

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


@SLOW
@given(
    text=st.text(alphabet="abc d", min_size=0, max_size=120),
    chunk=st.integers(2, 30),
    overlap_frac=st.floats(0, 0.9),
)
def test_chunking_laws(spark, text, chunk, overlap_frac):
    from kafkastreamingetl_spark.operators.corpus import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = (
        chunk_documents(df, chunk_chars=chunk, overlap=overlap)
        .orderBy("chunk_id")
        .toPandas()
    )
    # law 1: lossless — stripping each chunk's overlapping prefix
    # reconstructs the document exactly
    rebuilt = "".join(
        c if i == 0 else c[overlap:] for i, c in enumerate(chunks.chunk)
    )
    assert rebuilt == text
    # law 2: every chunk fits the window; ids are dense from 0
    assert (chunks.chunk.str.len() <= chunk).all()
    assert list(chunks.chunk_id) == list(range(len(chunks)))
    # law 3: every document yields at least one chunk
    assert len(chunks) >= 1


@SLOW
@given(
    words=st.lists(st.sampled_from(["ab", "cd", "ef", "gh"]), min_size=0, max_size=12)
)
def test_rolling_hash_laws(spark, words):
    from kafkastreamingetl_spark.operators.text import ROLL_P, doc_rolling_hash

    text = " ".join(words)
    reversed_text = " ".join(reversed(words))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, reversed_text)], "doc_id long, text string"
    )
    got = {r.doc_id: r.rolling_hash for r in doc_rolling_hash(df).collect()}
    # law 1: deterministic
    assert got[1] == got[2]
    # law 2: range-bounded
    assert all(0 <= h < ROLL_P for h in got.values())
    # law 3: order-sensitive whenever reversal actually changes the sequence
    if words != list(reversed(words)):
        assert got[1] != got[3]


@SLOW
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True))
def test_train_test_split_laws(spark, ids):
    from kafkastreamingetl_spark.operators.corpus import train_test_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = train_test_split(df).toPandas()
    # law 1: total function — every id assigned exactly once
    assert sorted(out.doc_id) == sorted(ids)
    # law 2: assignment agrees with the bucket
    assert (
        (out.split == "train") == (out.split_bucket < 80)
    ).all()
    # law 3: buckets in range
    assert out.split_bucket.between(0, 99).all()


vec_rows = st.lists(
    st.lists(
        st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
        min_size=8,
        max_size=8,
    ),
    min_size=3,
    max_size=8,
)


@SLOW
@given(vecs=vec_rows, scale=st.sampled_from([0.5, 2.0, 7.0]))
def test_int8_quantization_scale_invariance(spark, vecs, scale):
    """Absmax int8 codes are invariant to positive per-corpus scaling
    (the scale cancels in 127/max|v|), so int8 similarity on c·V equals
    int8 similarity on V exactly — the algebraic basis for comparing in
    the compressed domain."""
    from kafkastreamingetl_spark.operators.similarity import _int8_quantize

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    scaled = df.select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(float(scale))).alias(
            "embedding"
        ),
    )
    a = {r.vec_id: r.q for r in df.select("vec_id", _int8_quantize(F.col("embedding")).alias("q")).collect()}
    b = {r.vec_id: r.q for r in scaled.select("vec_id", _int8_quantize(F.col("embedding")).alias("q")).collect()}
    assert a == b


@SLOW
@given(
    toks=st.lists(st.integers(1, 9), min_size=1, max_size=12),
    budget=st.sampled_from([3, 5, 8]),
)
def test_pack_bins_laws(spark, toks, budget):
    """Packing laws for any doc stream: bin ids start at 0, are
    nondecreasing in id order, and a doc starts a new bin exactly when
    the running token count crosses the budget boundary."""
    from kafkastreamingetl_spark.operators.corpus import pack_token_bins

    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.bin_id)
        for r in pack_token_bins(df, budget=budget).collect()
    )
    cum = 0
    for (doc_id, n, bin_id), n_exp in zip(got, toks):
        assert n == n_exp
        assert bin_id == cum // budget
        cum += n
    assert got[0][2] == 0


doc_corpora = st.lists(
    st.tuples(
        st.integers(0, 30),  # doc_id (collisions possible → use index below)
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=12
        ),
    ),
    min_size=1,
    max_size=15,
)


def _corpus_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, " ".join(words), "en", "s", len(" ".join(words)))
            for i, (_, words) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@SLOW
@given(doc_corpora)
def test_dup_ngram_fraction_laws(spark, rows):
    """dup_frac ∈ [0,1]; dup_grams ≤ n_grams; a doc duplicated verbatim has
    dup_frac exactly 1; only shingleable docs (≥3 tokens) get a row."""
    from kafkastreamingetl_spark.operators.dedup import dup_ngram_doc_fraction

    df = _corpus_df(spark, rows)
    out = {r.doc_id: r for r in dup_ngram_doc_fraction(df).collect()}
    shingleable = {
        i for i, (_, words) in enumerate(rows) if len(words) >= 3
    }
    assert set(out) == shingleable
    for r in out.values():
        assert 0 <= r.dup_grams <= r.n_grams
        assert 0.0 <= r.dup_frac <= 1.0
    # duplicate every doc: every fraction becomes exactly 1.0
    if shingleable:
        doubled = df.union(df.withColumn("doc_id", F.col("doc_id") + 1000))
        out2 = dup_ngram_doc_fraction(doubled).collect()
        assert all(r.dup_frac == 1.0 for r in out2)


@SLOW
@given(doc_corpora)
def test_hot_ngrams_threshold_monotone(spark, rows):
    """Raising min_docs can only shrink the report, and every reported
    gram's n_docs honors the threshold."""
    from kafkastreamingetl_spark.operators.corpus import hot_ngrams

    df = _corpus_df(spark, rows)
    at2 = {r.gram: r.n_docs for r in hot_ngrams(df, min_docs=2, top=1000).collect()}
    at3 = {r.gram: r.n_docs for r in hot_ngrams(df, min_docs=3, top=1000).collect()}
    assert set(at3) <= set(at2)
    assert all(n >= 2 for n in at2.values())
    assert all(n >= 3 for n in at3.values())


@SLOW
@given(doc_corpora)
def test_percentile_filter_keeps_per_language_majority(spark, rows):
    """The cume_dist cutoff keeps strictly more than (1 - cutoff) - 1/n of
    each language, never drops a whole language, and kept docs are exactly
    those above the per-language boundary (monotone in score order)."""
    from kafkastreamingetl_spark.operators.corpus import (
        QP_CUTOFF,
        quality_percentile_filter,
    )

    df = _corpus_df(spark, [r for r in rows if r[1]])  # non-empty text
    n_in = df.count()
    if n_in == 0:
        return
    kept = quality_percentile_filter(df).collect()
    # every language that entered still has at least one survivor
    assert {r.lang for r in kept} == {r.lang for r in df.select("lang").collect()}
    # the keep fraction per language is ≥ 1 - cutoff (within the 1-row grain)
    assert len(kept) >= (1 - QP_CUTOFF) * n_in - 1


@SLOW
@given(doc_corpora)
def test_strip_boilerplate_laws(spark, rows):
    """Output tokens are an order-preserving subsequence of the input;
    n_removed accounts exactly for the difference; a doc sharing no gram
    with any other doc is untouched."""
    from kafkastreamingetl_spark.operators.corpus import strip_boilerplate

    df = _corpus_df(spark, rows)
    texts = {i: " ".join(words) for i, (_, words) in enumerate(rows)}
    out = {r.doc_id: r for r in strip_boilerplate(df, min_docs=2).collect()}
    assert set(out) == set(texts)
    for i, r in out.items():
        orig = texts[i].split(" ") if texts[i] else [""]
        clean = r.text_clean.split(" ") if r.text_clean else []
        # subsequence check
        it = iter(orig)
        assert all(any(tok == o for o in it) for tok in clean), (orig, clean)
        if r.text_clean == "":
            # concat_ws can't distinguish kept==[] (all tokens stripped)
            # from kept==[""] (the empty doc's lone token, which no
            # >=3-token gram can ever cover): empty input -> 0 removed,
            # non-empty input stripped to nothing -> all removed.
            expect = 0 if texts[i] == "" else r.n_tokens
            assert r.n_removed == expect, (texts[i], r)
        else:
            assert r.n_removed == r.n_tokens - len(clean), (texts[i], r)


@SLOW
@given(rows=events_rows)
def test_scd2_laws(spark, rows):
    """SCD2 collapse laws for ANY event log: (1) run event counts sum to
    the input count per user; (2) adjacent runs differ in state
    (null-safe); (3) replaying the history against a pure-Python collapse
    of the sorted sequence gives identical run counts."""
    from kafkastreamingetl_spark.operators.temporal import scd2_history

    df = _events_df(spark, rows)
    hist = scd2_history(df).collect()

    inp = df.select("user_id", "ts", "event_id", "event_type").collect()
    seqs: dict[int, list] = {}
    for r in sorted(inp, key=lambda r: (r.user_id, r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type)
    py_runs = {}
    for uid, states in seqs.items():
        n = 1
        for a, b in zip(states, states[1:]):
            if a != b:
                n += 1
        py_runs[uid] = n

    got_runs: dict[int, int] = {}
    got_events: dict[int, int] = {}
    for r in hist:
        got_runs[r.user_id] = max(got_runs.get(r.user_id, 0), r.run_seq)
        got_events[r.user_id] = got_events.get(r.user_id, 0) + r.n_events
    assert got_runs == py_runs
    assert got_events == {u: len(s) for u, s in seqs.items()}


@SLOW
@given(
    vals=st.lists(st.floats(0.01, 99.99, allow_nan=False), min_size=1, max_size=20)
)
def test_ewma_constant_and_bounds_laws(spark, vals):
    """EWMA laws: for a constant series the EWMA equals the constant (to
    cent rounding); for any series each EWMA lies within [min, max] of
    the values seen so far (+ cent slack)."""
    from kafkastreamingetl_spark.operators.temporal import user_value_ewma

    rows = [
        (i, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(user_value_ewma(df).collect(), key=lambda r: r.event_id)
    assert len(out) == len(vals)
    cents = [round(v * 100) / 100 for v in vals]
    for i, r in enumerate(out):
        lo, hi = min(cents[: i + 1]), max(cents[: i + 1])
        assert lo - 0.005 <= r.ewma_value <= hi + 0.005, (i, r.ewma_value, lo, hi)

    const = spark.createDataFrame(
        [(i, f"2024-01-01 00:00:{i:02d}", 1, "click", 41.5, "{}") for i in range(5)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    for r in user_value_ewma(const).collect():
        assert abs(r.ewma_value - 41.5) < 1e-9


@SLOW
@given(rows=events_rows)
def test_transition_matrix_laws(spark, rows):
    """Transition-matrix laws: per-from probabilities sum to 1; total
    transition count = sum over users of (len(sequence) - 1)."""
    from kafkastreamingetl_spark.operators.temporal import (
        event_transition_matrix,
    )

    df = _events_df(spark, rows)
    out = event_transition_matrix(df).collect()
    per_user = {
        r.user_id: r.n for r in df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    expected_total = sum(n - 1 for n in per_user.values())
    assert sum(r.n_transitions for r in out) == expected_total
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in out:
        by_from[r.from_type] += r.p_transition
    for f_, p in by_from.items():
        assert abs(p - 1.0) < 1e-9, (f_, p)
