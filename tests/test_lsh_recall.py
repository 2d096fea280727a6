"""Statistical behavior of the MinHash-LSH pipeline on a realistic corpus:
planted near-duplicates are recalled, unrelated documents are not paired.

Parity tests prove Spark == DuckDB; this proves the algorithm does its job.
With 4 bands × 3 rows the S-curve crosses ~0.63 Jaccard: pairs at ~0.85
should be caught with high probability, pairs near 0 almost never.
"""

from __future__ import annotations

import random

import pytest

from kafkastreamingetl_spark.operators.dedup import neardup_pairs
from kafkastreamingetl_spark.operators import similarity as sim_ops

VOCAB = [f"w{i:03d}" for i in range(600)]
N_BASE = 400
N_PLANTED = 60


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(1234)
    rows = []
    for i in range(N_BASE):
        words = rng.choices(VOCAB, k=rng.randint(30, 60))
        rows.append((i, " ".join(words)))
    # plant near-duplicates: copy a base doc, change ~6% of tokens
    planted = []
    for j in range(N_PLANTED):
        src_id = rng.randrange(N_BASE)
        words = rows[src_id][1].split(" ")
        n_edits = max(1, len(words) // 16)
        for _ in range(n_edits):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        dup_id = N_BASE + j
        rows.append((dup_id, " ".join(words)))
        planted.append((src_id, dup_id))
    return spark.createDataFrame(rows, "doc_id long, text string"), planted


def test_planted_neardups_are_recalled(spark, corpus):
    df, planted = corpus
    found = {
        (r.doc_a, r.doc_b): r.jaccard for r in neardup_pairs(df).collect()
    }
    hits = sum(1 for a, b in planted if (min(a, b), max(a, b)) in found)
    recall = hits / len(planted)
    assert recall >= 0.75, f"LSH recall {recall:.2f} below bound ({hits}/{len(planted)})"


def test_unrelated_docs_rarely_pair(spark, corpus):
    df, planted = corpus
    planted_set = {(min(a, b), max(a, b)) for a, b in planted}
    pairs = [
        (r.doc_a, r.doc_b, r.jaccard) for r in neardup_pairs(df).collect()
    ]
    false_pairs = [p for p in pairs if (p[0], p[1]) not in planted_set]
    # random 30-60-token docs over a 600-word vocab share few trigrams;
    # band collisions should be rare and any that survive carry the
    # evidence of a genuinely high jaccard
    assert len(false_pairs) <= 0.05 * len(pairs) + 5, false_pairs[:10]


def test_multiprobe_ann_recall_beats_single_probe(spark):
    """Recall@10 vs exact cosine top-10 on the real sf0.01 embeddings:
    probing the 8 Hamming-1 bucket flips must strictly improve on the
    single-bucket path (measured ~0.01 -> ~0.10 on this data)."""
    from kafkastreamingetl_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = sim_ops.self_queries(emb, n_queries=32)

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    exact = pairs(sim_ops.cosine_topk(emb, q))
    single = pairs(sim_ops.ann_hyperplane_topk(emb, q))
    multi = pairs(sim_ops.ann_hyperplane_topk(emb, q, hamming_probes=1))
    recall_single = len(single & exact) / len(exact)
    recall_multi = len(multi & exact) / len(exact)
    # NOT a superset assertion: multi-probe's top-10 legitimately displaces
    # weak single-bucket members with better neighbors from flipped buckets
    assert recall_multi > recall_single, (recall_multi, recall_single)
    assert recall_multi >= 0.05, recall_multi


def test_ivf_recall_scales_with_nprobe(spark):
    """IVF on the real sf0.01 embeddings: recall@10 vs exact cosine top-10
    must rise monotonically-or-equal with nprobe and reach 1.0 when every
    bucket is probed (exhaustive probing degenerates to brute force)."""
    from kafkastreamingetl_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = sim_ops.self_queries(emb, n_queries=16)
    cents = sim_ops.fit_label_centroids(emb)

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    exact = pairs(sim_ops.cosine_topk(emb, q))
    recalls = []
    for nprobe in (1, 2, len(cents)):
        got = pairs(sim_ops.ann_ivf_topk(emb, q, nprobe=nprobe, centroids=cents))
        recalls.append(len(got & exact) / len(exact))
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[2] == 1.0, recalls  # all buckets probed == exhaustive
    assert recalls[1] >= 0.3, recalls  # nprobe=2 must be a usable ANN


def test_pq_adc_beats_random_baseline(spark):
    """PQ with the 16-entry label-derived codebook is a coarse quantizer —
    the assertable claim is signal, not parity: recall@10 vs exact must
    beat the random baseline (10/|corpus| ≈ 0.005) by an order of
    magnitude, and the ADC ranking must be well-formed."""
    from kafkastreamingetl_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = sim_ops.self_queries(emb, n_queries=16)
    exact = {(r.query_id, r.vec_id) for r in sim_ops.cosine_topk(emb, q).collect()}
    rows = sim_ops.pq_topk(emb, q).collect()
    pq = {(r.query_id, r.vec_id) for r in rows}
    assert len(pq & exact) / len(exact) >= 0.05  # ≥10x random
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append((r.rank, r.adc))
    for ranks in per_query.values():
        ranks.sort()
        assert [r for r, _ in ranks] == list(range(1, 11))
        assert all(a <= b for (_, a), (_, b) in zip(ranks, ranks[1:]))


def test_multitable_ann_recall_beats_single_table(spark):
    """Recall@10 vs exact cosine top-10 on the real sf0.01 embeddings:
    three independent signature tables must strictly improve on one table
    ((1 - p^b)^T miss decay), and table count must be monotone (T=3 ≥ T=2
    in found-pair volume against the exact set)."""
    from kafkastreamingetl_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = sim_ops.self_queries(emb, n_queries=32)

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    exact = pairs(sim_ops.cosine_topk(emb, q))
    one = pairs(sim_ops.ann_multitable_topk(emb, q, n_tables=1))
    two = pairs(sim_ops.ann_multitable_topk(emb, q, n_tables=2))
    three = pairs(sim_ops.ann_multitable_topk(emb, q, n_tables=3))
    r1 = len(one & exact) / len(exact)
    r2 = len(two & exact) / len(exact)
    r3 = len(three & exact) / len(exact)
    # T=1 must equal the single-table path exactly (same planes, same rank)
    assert one == pairs(sim_ops.ann_hyperplane_topk(emb, q))
    assert r3 > r1, (r1, r2, r3)
    assert r3 >= r2 >= r1, (r1, r2, r3)
