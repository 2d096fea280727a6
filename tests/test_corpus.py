"""Corpus-preparation operators: split stability, chunk slicing exactness,
PII redaction behavior on planted data, TF-IDF ranking semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamingetl_spark.operators.corpus import (
    chunk_documents,
    pii_redact,
    tfidf_top_terms,
    train_test_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# train/test split
# ---------------------------------------------------------------------------


def test_split_is_stable_and_partition_invariant(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    a = {r.doc_id: r.split for r in train_test_split(df).collect()}
    b = {
        r.doc_id: r.split
        for r in train_test_split(df.repartition(7)).collect()
    }
    assert a == b  # membership is a pure function of the id, not layout
    n_train = sum(1 for s in a.values() if s == "train")
    assert 700 < n_train < 900  # ~80% of 1000, hash-uniform


def test_split_boundary_is_monotone(spark):
    """Raising train_pct only ADDS to train — nothing leaves it."""
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    t80 = {
        r.doc_id
        for r in train_test_split(df, train_pct=80).collect()
        if r.split == "train"
    }
    t90 = {
        r.doc_id
        for r in train_test_split(df, train_pct=90).collect()
        if r.split == "train"
    }
    assert t80 < t90


def test_split_salt_redraws(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in train_test_split(df, salt="v1").collect()}
    b = {r.doc_id: r.split for r in train_test_split(df, salt="v2").collect()}
    assert a != b


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunk_slicing_exact(spark):
    df = _docs(spark, [(1, "abcdefghij")])
    got = {
        r.chunk_id: r.chunk
        for r in chunk_documents(df, chunk_chars=4, overlap=1).collect()
    }
    # stride 3, starts 1/4/7/10: windows overlap by exactly one char
    assert got == {0: "abcd", 1: "defg", 2: "ghij", 3: "j"}


def test_chunk_reconstruction(spark):
    """Dropping each chunk's overlapping prefix reconstructs the text."""
    text = "the quick brown fox jumps over the lazy dog" * 5
    df = _docs(spark, [(1, text)])
    chunks = [
        r.chunk
        for r in chunk_documents(df, chunk_chars=50, overlap=10)
        .orderBy("chunk_id")
        .collect()
    ]
    assert chunks[0] + "".join(c[10:] for c in chunks[1:]) == text
    assert all(len(c) <= 50 for c in chunks)


def test_chunk_empty_and_null_text(spark):
    df = _docs(spark, [(1, ""), (2, None)])
    got = chunk_documents(df).collect()
    assert {(r.doc_id, r.chunk_id, r.chunk) for r in got} == {
        (1, 0, ""),
        (2, 0, ""),
    }


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), chunk_chars=10, overlap=10)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_pii_redacts_planted(spark):
    df = _docs(
        spark,
        [
            (1, "contact bob.smith+x@example.com or call 555-123-4567 now"),
            (2, "clean text with a small number 42 in it"),
        ],
    )
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert got[1].text_redacted == "contact <EMAIL> or call <NUM> now"
    assert got[1].n_emails == 1 and got[1].n_numbers == 1
    # short digit runs are not phone-shaped: untouched
    assert got[2].text_redacted == "clean text with a small number 42 in it"
    assert got[2].n_emails == 0 and got[2].n_numbers == 0


def test_pii_regex_dialect_parity_on_planted_pii(spark, tmp_path):
    """Java (Spark) vs RE2 (DuckDB) on the SHARED patterns, planted PII:
    the sf oracle proves parity on the real corpus, which may contain no
    PII at all — this pins the dialects against strings that exercise
    every pattern branch."""
    import duckdb

    from kafkastreamingetl_spark.operators.corpus import pii_redact, sql_pii_redact

    rows = [
        (1, "a.b-c_d%e+f@sub.domain.co and (555) 123-4567 trailing"),
        (2, "no pii here, just 123 and x@y"),  # too-short number, bad email
        (3, "two mails p@q.io r@s.org then 99999999"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = sorted(tuple(r) for r in pii_redact(df).collect())

    pq_path = str(tmp_path / "docs.parquet")
    df.write.parquet(pq_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq_path}/*.parquet')"
    )
    got_duck = sorted(tuple(r) for r in con.execute(sql_pii_redact()).fetchall())
    assert got_spark == got_duck


def test_pii_email_digits_not_double_counted(spark):
    df = _docs(spark, [(1, "mail 12345678@example.com please")])
    r = pii_redact(df).collect()[0]
    assert r.text_redacted == "mail <EMAIL> please"
    assert r.n_emails == 1 and r.n_numbers == 0


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def test_tfidf_ranks_distinctive_terms(spark):
    df = _docs(
        spark,
        [
            (1, "common common zebra"),
            (2, "common common yak yak"),
            (3, "common plain"),
        ],
    )
    got = {
        (r.doc_id, r.rank): r
        for r in tfidf_top_terms(df, k=2).collect()
    }
    # 'common' appears in every doc -> idf ln(4/4)=0 -> score 0; the
    # doc-unique term must outrank it despite lower tf
    assert got[(1, 1)].term == "zebra"
    assert got[(2, 1)].term == "yak"
    assert got[(1, 2)].term == "common" and got[(1, 2)].score_micro == 0
    # ubiquitous-term score is exactly zero in micro-units
    assert got[(1, 1)].score_micro > 0


def test_tfidf_tie_breaks_by_term(spark):
    df = _docs(spark, [(1, "beta alpha"), (2, "other words")])
    got = tfidf_top_terms(df, k=2).where(F.col("doc_id") == 1).collect()
    # equal tf and df -> equal score -> alphabetical order
    assert [r.term for r in sorted(got, key=lambda r: r.rank)] == ["alpha", "beta"]


def test_training_mix_monotone_and_rated(spark):
    """Mixture laws: raising a source's rate only adds documents, and the
    realized per-source fractions track the requested rates."""
    from kafkastreamingetl_spark.operators.corpus import training_mix_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    lo = {r.doc_id for r in training_mix_sample(df, {"src0": 0.2}).collect()
          if r.source == "src0"}
    hi = {r.doc_id for r in training_mix_sample(df, {"src0": 0.6}).collect()
          if r.source == "src0"}
    assert lo < hi  # monotone growth
    assert abs(len(lo) / 1000 - 0.2) < 0.06 and abs(len(hi) / 1000 - 0.6) < 0.06
    # unlisted sources fall back to the default rate (10%)
    rest = [r for r in training_mix_sample(df, {"src0": 0.5}).collect()
            if r.source != "src0"]
    assert abs(len(rest) / 3000 - 0.10) < 0.04


def test_pack_token_bins_concat_and_split_semantics(spark):
    """Planted docs with known token counts: bins cut at the budget
    boundary in (source, doc_id) order; a doc's bin is where its first
    token lands; sources pack independently."""
    from kafkastreamingetl_spark.operators.corpus import pack_token_bins

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),        # tokens 0-2   -> bin 0
            (2, "d e", "s1"),          # tokens 3-4   -> bin 0
            (3, "f g h", "s1"),        # starts at 5  -> bin 1 (budget 5)
            (4, "i", "s1"),            # starts at 8  -> bin 1
            (5, "x y z w v u", "s2"),  # own source   -> bin 0
            (6, "q", "s2"),            # starts at 6  -> bin 1
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.bin_id, r.n_tokens)
        for r in pack_token_bins(df, budget=5).collect()
    }
    assert got == {
        1: (0, 3), 2: (0, 2), 3: (1, 3), 4: (1, 1), 5: (0, 6), 6: (1, 1),
    }


def test_dedup_rate_by_source_counts_planted_dups(spark):
    from kafkastreamingetl_spark.operators.corpus import dedup_rate_by_source

    df = spark.createDataFrame(
        [
            (1, "same", "s1"), (2, "same", "s1"), (3, "other", "s1"),
            (4, "uniq", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: (r.n_docs, r.n_distinct, r.n_dups, r.dup_rate)
           for r in dedup_rate_by_source(df).collect()}
    assert got["s1"] == (3, 2, 1, 1 / 3)
    assert got["s2"] == (4 - 3, 1, 0, 0.0)


def test_quality_weighted_sample_monotone_and_weighted(spark):
    """Raising base_rate only ADDS documents (same salted uniform, higher
    threshold); a maximally repetitive doc (weight→0) needs a much higher
    rate than a fully distinct one to be kept."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.corpus import quality_weighted_sample

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept_lo = {r.doc_id for r in quality_weighted_sample(docs, base_rate=0.3).collect()}
    kept_hi = {r.doc_id for r in quality_weighted_sample(docs, base_rate=0.9).collect()}
    assert kept_lo <= kept_hi
    assert len(kept_hi) > len(kept_lo)
    # weights really gate acceptance: a weight-w doc is kept iff u < r*w,
    # so across the corpus the kept set's mean weight exceeds the dropped
    # set's (u is independent of the text)
    rows = quality_weighted_sample(docs, base_rate=0.5).collect()
    all_w = {
        r.doc_id: r.quality_weight
        for r in quality_weighted_sample(docs, base_rate=10.0).collect()
    }  # rate 10 ≈ keep-all (u < 10*w for any w > u/10)
    kept = {r.doc_id for r in rows}
    mean = lambda xs: sum(xs) / len(xs)
    kept_w = [w for d, w in all_w.items() if d in kept]
    drop_w = [w for d, w in all_w.items() if d not in kept]
    assert kept_w and drop_w and mean(kept_w) > mean(drop_w)


def test_temperature_sampling_flattens_skewed_sources(spark):
    """With a 10:1 source imbalance at alpha=0.5, the small source keeps
    rate 1.0 (it is the max after normalization), the big source keeps
    ~sqrt(1/10) of the normalized mass, and alpha=1 is a pass-through."""
    from kafkastreamingetl_spark.operators.corpus import temperature_mix_sample

    rows = [(i, f"t {i}", "en", "big" if i < 1000 else "small", 3) for i in range(1100)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = temperature_mix_sample(df)
    rates = {
        r.source: r.keep_rate for r in out.select("source", "keep_rate").distinct().collect()
    }
    assert rates["small"] == 1.0
    # big: (1000/1100)^-0.5 / (100/1100)^-0.5 = sqrt(100/1000) ≈ 0.316
    assert abs(rates["big"] - (100 / 1000) ** 0.5) < 1e-12
    kept = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # realized counts flatten: big/small ratio drops from 10 toward sqrt(10)
    assert kept["small"] > 90  # nearly all of the small source survives
    assert kept["big"] / kept["small"] < 5

    everything = temperature_mix_sample(df, alpha=1.0)
    assert everything.count() == 1100


def test_lm_score_orders_typical_below_rare(spark):
    """A document made of the corpus's dominant bigrams must score a lower
    average NLL than one made of bigrams seen nowhere else."""
    from kafkastreamingetl_spark.operators.corpus import doc_lm_score

    common = [(i, "a b a b a b a b", "en", "s", 15) for i in range(8)]
    rows = common + [
        (100, "a b a b a b a b", "en", "s", 15),  # typical
        (101, "q r s t u v w x", "en", "s", 15),  # all-rare bigrams
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r.avg_nll_micro for r in doc_lm_score(df).collect()}
    assert out[100] < out[101]
    # every scored doc has the full bigram count (7 bigrams over 8 tokens)
    n = {r.doc_id: r.n_bigrams for r in doc_lm_score(df).collect()}
    assert set(n.values()) == {7}


def test_token_budget_sample_reaches_but_bounds_budget(spark):
    """Every source with enough data crosses the budget exactly once: the
    kept set's total is >= budget (the crossing doc is kept), and
    removing that last doc would drop it back under budget."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.corpus import (
        BUDGET_TOKENS_PER_SOURCE,
        token_budget_sample,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = token_budget_sample(docs).collect()
    by_source: dict[str, list] = {}
    for r in kept:
        by_source.setdefault(r.source, []).append(r)
    totals = {
        s: sum(r.n_tokens for r in rows) for s, rows in by_source.items()
    }
    source_mass = {
        r.source: r.m
        for r in docs.groupBy("source")
        .agg(F.expr("sum(size(split(text, ' ')))").alias("m"))
        .collect()
    }
    for s, total in totals.items():
        if source_mass[s] >= BUDGET_TOKENS_PER_SOURCE:
            assert total >= BUDGET_TOKENS_PER_SOURCE, s
            last = max(by_source[s], key=lambda r: r.cum_tokens)
            assert total - last.n_tokens < BUDGET_TOKENS_PER_SOURCE, s
        else:
            assert total == source_mass[s], s  # small sources kept whole

    # determinism: independent of input partitioning
    kept2 = {
        r.doc_id
        for r in token_budget_sample(docs.repartition(17)).collect()
    }
    assert kept2 == {r.doc_id for r in kept}


def test_token_posting_lists_cap_and_true_df(spark):
    from kafkastreamingetl_spark.operators.corpus import token_posting_lists

    docs = spark.createDataFrame(
        [
            (1, "a b a"),   # 'a' twice in one doc counts once
            (2, "a c"),
            (3, "a"),
            (4, "b  x"),    # double space: empty token filtered
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.token: r
        for r in token_posting_lists(docs, top_tokens=2, cap=2).collect()
    }
    # top-2 by df: a(3), b(2); c and x lose the limit
    assert set(rows) == {"a", "b"}
    assert rows["a"].df == 3          # TRUE df, counted before the cap
    assert rows["a"].postings == "1,2"  # capped to the 2 smallest, sorted
    assert rows["b"].df == 2
    assert rows["b"].postings == "1,4"


def test_token_posting_lists_tie_break_is_token_text(spark):
    from kafkastreamingetl_spark.operators.corpus import token_posting_lists

    docs = spark.createDataFrame(
        [(1, "z y"), (2, "z y"), (3, "q")], "doc_id bigint, text string"
    )
    rows = token_posting_lists(docs, top_tokens=1, cap=5).collect()
    # y and z tie at df=2: 'y' wins the limit by token-text ascending
    assert [r.token for r in rows] == ["y"]


def test_doc_oov_rate_hand_computed(spark):
    """Vocabulary = top-2 tokens by occurrences (lexical tie-break); OOV
    counts token INSTANCES outside it."""
    from kafkastreamingetl_spark.operators.corpus import doc_oov_rate

    docs = spark.createDataFrame(
        [
            (1, "the the the cat"),   # the x3, cat x1
            (2, "the cat dog"),       # dog is OOV (vocab = the, cat)
            (3, "emu emu"),           # both instances OOV
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in doc_oov_rate(docs, top=2).collect()}
    # counts: the=4, cat=2, dog=1, emu=2 -> top2 = the(4), cat(2)
    # (emu ties cat at 2 but 'cat' < 'emu' lexically)
    assert got[1].n_oov == 0 and got[1].oov_rate == 0.0
    assert got[2].n_tokens == 3 and got[2].n_oov == 1
    assert got[3].n_oov == 2 and got[3].oov_rate == 1.0
    assert 4 not in got


# ---------------------------------------------------------------------------
# weighted_doc_sample (exact-K without replacement)
# ---------------------------------------------------------------------------


def test_weighted_sample_exact_k_and_key_formula(spark):
    """Returns exactly k rows; the priority key matches the
    Efraimidis-Spirakis formula computed independently in Python
    (salted-hash uniform, ln(u)/weight, micro-nat rounding)."""
    import math

    from kafkastreamingetl_spark.functions import py_hash60
    from kafkastreamingetl_spark.operators.corpus import (
        QW_BUCKETS,
        WS_MICRO,
        WS_SALT,
        weighted_doc_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", "w" + " w" * (i % 5) + f" t{i}") for i in range(20)],
        "doc_id long, source string, text string",
    )
    got = weighted_doc_sample(docs, k=5).collect()
    assert len(got) == 5
    for r in got:
        toks = None
        # recompute weight from the constructed text
        row_text = "w" + " w" * (r.doc_id % 5) + f" t{r.doc_id}"
        toks = row_text.split(" ")
        w = len(set(toks)) / len(toks)
        u = (py_hash60(WS_SALT + str(r.doc_id)) % QW_BUCKETS + 1) / float(
            QW_BUCKETS + 1
        )
        assert r.quality_weight == w
        assert r.sample_key_micro == round(math.log(u) / w * WS_MICRO)


def test_weighted_sample_deterministic_and_salt_sensitive(spark):
    from kafkastreamingetl_spark.operators.corpus import weighted_doc_sample

    docs = spark.createDataFrame(
        [(i, "s", f"alpha beta gamma t{i} t{i % 3}") for i in range(50)],
        "doc_id long, source string, text string",
    )
    a = [r.doc_id for r in weighted_doc_sample(docs, k=10).collect()]
    b = [r.doc_id for r in weighted_doc_sample(docs, k=10).collect()]
    assert a == b
    # repartitioning cannot change the selected set or its order
    c = [
        r.doc_id
        for r in weighted_doc_sample(docs.repartition(7), k=10).collect()
    ]
    assert a == c
    d = [
        r.doc_id
        for r in weighted_doc_sample(docs, k=10, salt="other:v1").collect()
    ]
    assert a != d  # a re-draw re-keys the lottery


def test_weighted_sample_k_exceeding_corpus_returns_all_nonnull(spark):
    from kafkastreamingetl_spark.operators.corpus import weighted_doc_sample

    docs = spark.createDataFrame(
        [(1, "s", "a b"), (2, "s", None), (3, "s", "c d")],
        "doc_id long, source string, text string",
    )
    got = weighted_doc_sample(docs, k=10).collect()
    assert sorted(r.doc_id for r in got) == [1, 3]  # null text never drawn


def test_corpus_snapshot_diff_hand_computed(spark):
    """All four statuses from constructed snapshots; a doc whose text
    nulls out between snapshots is `changed` (never silently unchanged)."""
    from kafkastreamingetl_spark.operators.corpus import corpus_snapshot_diff

    old = spark.createDataFrame(
        [(1, "keep"), (2, "rewrite me"), (3, "drop me"), (5, "was text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "keep"), (2, "rewritten"), (4, "brand new"), (5, None)],
        "doc_id long, text string",
    )
    got = {r.status: r.n_docs for r in corpus_snapshot_diff(old, new).collect()}
    assert got == {"unchanged": 1, "changed": 2, "removed": 1, "added": 1}


# ---------------------------------------------------------------------------
# frequent_tokens_sketch (Misra-Gries candidates + exact verify)
# ---------------------------------------------------------------------------


def _brute_heavy(texts: list[str], capacity: int) -> dict[str, int]:
    from collections import Counter

    toks = [t for s in texts for t in s.split(" ")]
    n = len(toks)
    c = Counter(toks)
    return {t: k for t, k in c.items() if k * (capacity + 1) > n}


def test_frequent_tokens_sketch_hand_computed(spark):
    """capacity=2 → threshold share 1/3: 'a' (6/12) passes, 'b' (3/12)
    does not even though it likely survives the sketch — the exact verify
    pass discards it."""
    from kafkastreamingetl_spark.operators.corpus import frequent_tokens_sketch

    texts = ["a a a b", "a b c d", "a a b e"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.token: r.n_occ
        for r in frequent_tokens_sketch(docs, capacity=2).collect()
    }
    assert got == _brute_heavy(texts, 2) == {"a": 6}


def test_frequent_tokens_sketch_partitioning_invariant(spark):
    """Candidate SETS depend on where partition splits fall; the verified
    output must not."""
    from kafkastreamingetl_spark.operators.corpus import frequent_tokens_sketch

    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(
            rng.choices(vocab, weights=[50, 30, 20] + [1] * 37, k=30)
        )
        for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    outs = []
    for parts in (1, 7):
        rows = frequent_tokens_sketch(
            docs.repartition(parts), capacity=5
        ).collect()
        outs.append(sorted((r.token, r.n_occ, r.share) for r in rows))
    assert outs[0] == outs[1]
    assert {t for t, _, _ in outs[0]} == set(_brute_heavy(texts, 5))


def test_frequent_tokens_sketch_matches_brute_force_seeded(spark):
    """Seeded sweep over skew shapes and capacities: sketch+verify equals
    the Counter brute force every time (the MG superset guarantee plus
    the strict exact filter)."""
    from kafkastreamingetl_spark.operators.corpus import frequent_tokens_sketch

    import random

    for seed, cap in [(1, 3), (2, 10), (3, 4)]:
        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(rng.randint(5, 80))]
        weights = [rng.choice([1, 1, 1, 2, 5, 40]) for _ in vocab]
        texts = [
            " ".join(rng.choices(vocab, weights=weights, k=rng.randint(5, 40)))
            for _ in range(40)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ).repartition(5)
        got = {
            r.token: r.n_occ
            for r in frequent_tokens_sketch(docs, capacity=cap).collect()
        }
        assert got == _brute_heavy(texts, cap), (seed, cap)


def test_mg_partition_superset_and_bounded():
    """Direct summary check: across multi-batch streams the survivor set
    stays <= capacity, contains every token above the n_p/(k+1) bound,
    and the NULL row carries the exact partition total."""
    import pandas as pd

    from collections import Counter

    from kafkastreamingetl_spark.operators.corpus import _mg_partition

    import random

    rng = random.Random(11)
    stream = rng.choices(
        ["hot"] * 5 + [f"cold{i}" for i in range(30)], k=500
    )
    batches = [
        pd.DataFrame({"token": stream[i : i + 64]})
        for i in range(0, 500, 64)
    ]
    out = pd.concat(list(_mg_partition(8)(iter(batches))))
    survivors = set(out[out["token"].notna()]["token"])
    assert len(survivors) <= 8
    total = int(out[out["token"].isna()]["weight"].iloc[0])
    assert total == 500
    true_counts = Counter(stream)
    for tok, cnt in true_counts.items():
        if cnt * 9 > 500:
            assert tok in survivors, tok


def test_mg_merge_preserves_superset_guarantee():
    """Partition the stream arbitrarily, summarize each piece, merge the
    summaries: the merged survivor set stays <= capacity, the NULL row
    carries the exact global total, and every global heavy hitter
    (count > n/(k+1)) survives the merge — the mergeability property the
    tree collapse relies on."""
    import pandas as pd

    from collections import Counter

    from kafkastreamingetl_spark.operators.corpus import (
        _mg_merge,
        _mg_partition,
    )

    import random

    rng = random.Random(23)
    stream = rng.choices(
        ["hh1"] * 6 + ["hh2"] * 4 + [f"cold{i}" for i in range(50)], k=2000
    )
    cap = 6
    cuts = sorted(rng.sample(range(1, 2000), 9))
    pieces = [
        stream[a:b] for a, b in zip([0] + cuts, cuts + [2000]) if b > a
    ]
    summaries = [
        pd.concat(list(_mg_partition(cap)(iter([pd.DataFrame({"token": p})]))))
        for p in pieces
    ]
    merged = pd.concat(list(_mg_merge(cap)(iter(summaries))))
    survivors = set(merged[merged["token"].notna()]["token"])
    assert len(survivors) <= cap
    assert int(merged[merged["token"].isna()]["weight"].iloc[0]) == 2000
    for tok, cnt in Counter(stream).items():
        if cnt * (cap + 1) > 2000:
            assert tok in survivors, tok


def test_mg_summary_driver_payload_bounded(spark):
    """The collected summary is O(capacity) rows REGARDLESS of input
    partitioning (VERDICT r9 item 3): the tree merge keeps the driver
    payload <= 2*(capacity+1) where the old flat collect grew as
    partitions*(capacity+1)."""
    import random

    from kafkastreamingetl_spark.operators.corpus import mg_summary

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choices(vocab, weights=[40, 25] + [1] * 58, k=25))
        for _ in range(80)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cap = 5
    for parts in (1, 13, 40):
        rows = mg_summary(docs.repartition(parts), capacity=cap).collect()
        assert len(rows) <= 2 * (cap + 1), (parts, len(rows))
        assert sum(r.weight for r in rows if r.token is None) == 80 * 25


def test_bigram_pmi_hand_computed(spark):
    """Planted collocation: 'new york' co-occurs in every doc while the
    filler words are shuffled per doc (every filler word is frequent, but
    no filler ADJACENCY repeats enough to clear the floor) — the planted
    pair is the only survivor, with the exact quantized score
    ln(c2*n^2/(nb*c1a*c1b))."""
    import math
    import random

    from kafkastreamingetl_spark.operators.corpus import bigram_pmi

    rng = random.Random(3)
    filler = ["cat", "dog", "tree", "lake", "bird", "rock"]
    rows_in = []
    for i in range(6):
        shuffled = filler[:]
        rng.shuffle(shuffled)
        rows_in.append((i, "new york " + " ".join(shuffled)))
    docs = spark.createDataFrame(rows_in, "doc_id long, text string")
    out = bigram_pmi(docs, min_pair=5, k=5).collect()
    assert [(r.w1, r.w2) for r in out] == [("new", "york")]
    n_tokens = 8 * 6
    n_bigrams = 7 * 6
    expected = round(
        math.log((6.0 * n_tokens * n_tokens) / (float(n_bigrams) * 6 * 6))
        * 1_000_000
    )
    top = out[0]
    assert top.n_pair == 6 and top.pmi_micro == expected


def test_bigram_pmi_min_pair_floor(spark):
    """A unique rare pair (would have huge PMI) is excluded by the floor."""
    from kafkastreamingetl_spark.operators.corpus import bigram_pmi

    docs = spark.createDataFrame(
        [(1, "qux zap"), (2, "a b a b a b a b a b")],
        "doc_id long, text string",
    )
    rows = bigram_pmi(docs, min_pair=5, k=10).collect()
    pairs = {(r.w1, r.w2) for r in rows}
    assert ("qux", "zap") not in pairs
    assert ("a", "b") in pairs


def test_length_bucket_stats_hand_computed(spark):
    """Exact power-of-two edges land in the right bucket and the waste
    arithmetic is integer-exact: n=4 ('a b c d') is bucket 2 (cap 8),
    n=1 bucket 0 (cap 2), n=3 bucket 1 (cap 4)."""
    from kafkastreamingetl_spark.operators.corpus import length_bucket_stats

    docs = spark.createDataFrame(
        [
            (1, "a"),  # n=1 -> bucket 0, cap 2, waste 1
            (2, "a b c"),  # n=3 -> bucket 1, cap 4, waste 1
            (3, "a b c d"),  # n=4 -> bucket 2, cap 8, waste 4
            (4, "a b c d e f g"),  # n=7 -> bucket 2, cap 8, waste 1
            (5, None),  # empty doc: excluded (n=0 has no bucket)
        ],
        "doc_id long, text string",
    )
    rows = {r.bucket: r for r in length_bucket_stats(docs).collect()}
    assert set(rows) == {0, 1, 2}
    assert (rows[0].n_docs, rows[0].sum_tokens, rows[0].pad_waste_tokens) == (1, 1, 1)
    assert (rows[1].n_docs, rows[1].sum_tokens, rows[1].pad_waste_tokens) == (1, 3, 1)
    assert (rows[2].n_docs, rows[2].sum_tokens, rows[2].pad_waste_tokens) == (2, 11, 5)
    assert float(rows[2].pad_waste_frac) == round(5 / 16, 4)


def test_source_audit_report_planted_duplicates(spark):
    """dup_frac counts exact content repeats per source; language spread
    and char totals ride the same single aggregate."""
    from kafkastreamingetl_spark.operators.corpus import source_audit_report

    docs = spark.createDataFrame(
        [
            (1, "same text", "en", "web"),
            (2, "same text", "en", "web"),
            (3, "other text", "de", "web"),
            (4, "unique here", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r.source: r for r in source_audit_report(docs).collect()}
    web, books = rows["web"], rows["books"]
    assert (web.n_docs, web.n_langs, web.n_distinct_texts) == (3, 2, 2)
    assert float(web.dup_frac) == round(1 - 2 / 3, 4)
    assert (books.n_docs, books.n_distinct_texts) == (1, 1)
    assert float(books.dup_frac) == 0.0
    assert web.n_chars_total == len("same text") * 2 + len("other text")


def test_length_bucket_stats_matches_brute_force_seeded(spark):
    """Randomized cross-check against a driver-side reference: bucket
    membership (floor(log2)), per-bucket doc/token sums, and the exact
    power-of-two capacity arithmetic, on a corpus with blank/NULL docs."""
    import math
    import random

    from kafkastreamingetl_spark.operators.corpus import length_bucket_stats

    rng = random.Random(23)
    rows = []
    for i in range(200):
        kind = rng.random()
        if kind < 0.05:
            rows.append((i, None))
        elif kind < 0.1:
            rows.append((i, "   "))
        else:
            rows.append((i, " ".join("w" for _ in range(rng.randint(1, 600)))))
    # driver-side reference (split(' ') semantics: blanks excluded by trim)
    expected: dict[int, list[int]] = {}
    for _i, text in rows:
        if text is None or not text.strip():
            continue
        n = len(text.split(" "))
        b = int(math.floor(math.log2(n)))
        expected.setdefault(b, []).append(n)

    got = {r.bucket: r for r in length_bucket_stats(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}
    assert set(got) == set(expected)
    for b, ns in expected.items():
        cap = 2 ** (b + 1)
        r = got[b]
        assert r.n_docs == len(ns)
        assert r.sum_tokens == sum(ns)
        assert r.pad_waste_tokens == sum(cap - n for n in ns)
        assert all(2**b <= n < cap for n in ns)  # reference self-check


# ---------------------------------------------------------------------------
# BM25 retrieval (round 12)
# ---------------------------------------------------------------------------


def _bm25_reference(docs, n_query_docs, k):
    """Pure-Python twin of bm25_topk's exact arithmetic (half-up rounding,
    the cleared integer-ratio saturation, micro-quantized idf). Returns
    {(query_id, doc_id): score_micro} for the top-k rows."""
    import math

    def half_up(x):
        return math.floor(x + 0.5)

    toks = {d: [w for w in (t or "").split(" ") if w] for d, t in docs}
    tf = {}
    for d, ws in toks.items():
        for w in ws:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dl = {d: len(ws) for d, ws in toks.items() if ws}
    n_docs = len(docs)
    total_len = sum(dl.values())
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    idf = {
        w: half_up(
            math.log((float(n_docs) - c + 0.5) / (c + 0.5) + 1.0) * 1_000_000.0
        )
        for w, c in df.items()
    }
    scores = {}
    for qid, ws in toks.items():
        if qid >= n_query_docs:
            continue
        for w in set(ws):
            for (d, w2), f in tf.items():
                if w2 != w:
                    continue
                num = (44.0 * f) * total_len
                den = (
                    (20.0 * total_len) * f
                    + 6.0 * total_len
                    + (18.0 * dl[d]) * n_docs
                )
                scores[(qid, d)] = scores.get((qid, d), 0) + half_up(
                    (float(idf[w]) * num) / den
                )
    out = {}
    for qid in {q for q, _ in scores}:
        rows = sorted(
            ((d, s) for (q, d), s in scores.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        for d, s in rows:
            out[(qid, d)] = s
    return out


def test_bm25_matches_python_reference_and_ranks_self_first(spark):
    from kafkastreamingetl_spark.operators.corpus import bm25_topk

    docs = [
        (0, "spark shuffle join broadcast join"),
        (1, "kafka stream offset replay checkpoint"),
        (2, "spark shuffle join broadcast join extra words here now"),
        (3, "kafka stream offset"),
        (4, "completely unrelated tokens about cats and dogs"),
        (5, "broadcast join spark"),
        (6, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, k=3, n_query_docs=2).collect()
    ref = _bm25_reference(docs, n_query_docs=2, k=3)
    assert {(r.query_id, r.doc_id): r.score_micro for r in got} == ref
    rank1 = {r.query_id: r.doc_id for r in got if r.rank == 1}
    assert rank1 == {0: 0, 1: 1}  # self-retrieval tops each list
    # per-query result is k-capped and ranks are dense from 1
    for q in (0, 1):
        ranks = sorted(r.rank for r in got if r.query_id == q)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3


def test_bm25_idf_penalizes_common_terms(spark):
    from kafkastreamingetl_spark.operators.corpus import bm25_topk

    # 'the' is in every doc (idf ~ ln(1 + 1/(N-0.5+...)) -> tiny); 'rare'
    # only in docs 0 and 3 — doc 3 must outrank docs that match only 'the'.
    docs = [
        (0, "rare the"),
        (1, "the filler words the"),
        (2, "the other filler the"),
        (3, "rare document the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, k=3, n_query_docs=1).collect()
    by_rank = {r.rank: r.doc_id for r in got}
    assert by_rank[1] == 0 and by_rank[2] == 3


def test_bm25_empty_and_null_docs_never_score(spark):
    from kafkastreamingetl_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, None), (2, ""), (3, "alpha")],
        "doc_id long, text string",
    )
    got = bm25_topk(df, k=5, n_query_docs=1).collect()
    assert {r.doc_id for r in got} == {0, 3}


# ---------------------------------------------------------------------------
# CCNet bucket mix, Zipf slope, line dedup (round 12)
# ---------------------------------------------------------------------------


def test_lm_bucket_mix_exact_tertile_boundaries(spark):
    from kafkastreamingetl_spark.operators.corpus import lm_score_bucket_mix

    # 6 'en' docs and 4 'de' docs, all with >= 2 tokens. Bucket counts
    # must follow 3*(rank-1)/n exactly: 6 -> 2/2/2, 4 -> 2/1/1.
    rows = []
    for i in range(6):
        rows.append((i, "alpha beta " + f"tok{i} tok{i} tok{i}", "en"))
    for i in range(6, 10):
        rows.append((i, "gamma delta " + f"tok{i} tok{i}", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = lm_score_bucket_mix(df).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["en"]) == 6 and len(by_lang["de"]) == 4
    import collections

    en = collections.Counter(r.bucket for r in by_lang["en"])
    de = collections.Counter(r.bucket for r in by_lang["de"])
    assert en == {"head": 2, "middle": 2, "tail": 2}
    assert de == {"head": 2, "middle": 1, "tail": 1}
    # buckets are monotone in score within a language
    for lang, rs in by_lang.items():
        order = {"head": 0, "middle": 1, "tail": 2}
        rs = sorted(rs, key=lambda r: (r.avg_nll_micro, r.doc_id))
        assert [order[r.bucket] for r in rs] == sorted(
            order[r.bucket] for r in rs
        )


def test_zipf_slope_matches_python_reference(spark):
    from kafkastreamingetl_spark.operators.corpus import vocab_zipf_slope
    import math

    # counts 8/4/2/1 for t1..t4 (plus deterministic tie-break by token)
    text = " ".join(["t1"] * 8 + ["t2"] * 4 + ["t3"] * 2 + ["t4"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = vocab_zipf_slope(df).collect()[0]
    assert r.n_ranks == 4

    def half_up(x):
        return math.floor(x + 0.5)

    pts = [
        (half_up(math.log(i + 1) * 1e6), half_up(math.log(c) * 1e6))
        for i, c in enumerate([8, 4, 2, 1])
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    expected = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert abs(r.zipf_slope - expected) < 1e-12
    # a 1/r power law has slope -1; 8/4/2/1 is exactly 2^-r scaled -> the
    # slope of ln c on ln r is -3 ln 2 / ... just sanity-bound it:
    assert r.zipf_slope < -0.9


def test_doc_dedup_lines_keeps_first_occurrence(spark):
    from kafkastreamingetl_spark.operators.text import doc_dedup_lines

    text = "nav menu\nreal content one\nnav menu\nreal content two\nnav menu"
    df = spark.createDataFrame(
        [(1, text), (2, "a\nb\nc"), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in doc_dedup_lines(df).collect()}
    assert got[1].n_lines == 5 and got[1].n_removed == 2
    assert got[1].text_clean == "nav menu\nreal content one\nreal content two"
    assert got[2].n_removed == 0 and got[2].text_clean == "a\nb\nc"
    assert got[3].n_lines == 1 and got[3].n_removed == 0
    assert got[3].text_clean == ""


# ---------------------------------------------------------------------------
# per-source dedup-rate trend (round 13, final cohort)
# ---------------------------------------------------------------------------


def test_source_dedup_trend_first_occurrence_attribution(spark):
    """A hash's FIRST (day, doc_id) occurrence is clean; every later
    arrival is a dup — including later arrivals within the same day and
    re-crawls by a DIFFERENT source on a later day."""
    from kafkastreamingetl_spark.operators.corpus import source_dedup_trend
    from pyspark.sql import functions as F

    rows = [
        # (doc_id, text, source) — day := doc_id % 7
        (0, "alpha", "s1"),   # day 0: first alpha
        (7, "alpha", "s1"),   # day 0: same-day dup (later doc_id)
        (1, "alpha", "s2"),   # day 1: cross-source re-crawl -> dup
        (2, "beta", "s2"),    # day 2: clean
        (9, "beta", "s2"),    # day 2: same-day dup
        (3, "gamma", "s1"),   # day 3: clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df = df.withColumn("lang", F.lit("en"))
    got = {
        (r.source, r.ingest_day): r for r in source_dedup_trend(df).collect()
    }
    assert got[("s1", 0)].n_docs == 2 and got[("s1", 0)].n_dup == 1
    assert got[("s2", 1)].n_dup == 1  # cross-source later-day re-crawl
    assert got[("s2", 2)].n_docs == 2 and got[("s2", 2)].n_dup == 1
    assert got[("s1", 3)].n_dup == 0
    assert abs(got[("s1", 0)].dup_frac - 0.5) < 1e-12
