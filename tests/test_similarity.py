"""Similarity search: exact top-k agrees with a NumPy oracle; the ANN path
only ever compares within buckets and scores identically to the exact path
on the pairs it does return.
"""

from __future__ import annotations

import numpy as np
import pytest

from kafkastreamingetl_spark.catalog import load_table
from kafkastreamingetl_spark.operators.similarity import (
    ann_hyperplane_topk,
    cosine_topk,
    self_queries,
)

K = 5
N_QUERIES = 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def np_vectors(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def test_cosine_topk_matches_numpy(spark, emb, np_vectors):
    ids, mat = np_vectors
    got = cosine_topk(emb, self_queries(emb, N_QUERIES), k=K).collect()
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(N_QUERIES):
        q = mat[ids == qid][0]
        cos = (mat @ q) / (norms * np.linalg.norm(q))
        cos[ids == qid] = -np.inf  # self-match excluded
        # expected ids: top-K by (cos desc, vec_id asc)
        order = sorted(zip(-cos, ids))[:K]
        expected = [int(i) for _, i in order]
        mine = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert mine == expected, f"query {qid}"
        for r in got:
            if r.query_id == qid:
                assert abs(r.cos - cos[ids == r.vec_id][0]) < 1e-12


def test_ann_scores_match_exact_and_respect_k(spark, emb):
    ann = ann_hyperplane_topk(emb, self_queries(emb, N_QUERIES), k=K).collect()
    exact = {
        (r.query_id, r.vec_id): r.cos
        for r in cosine_topk(emb, self_queries(emb, N_QUERIES), k=10**6).collect()
    }
    assert len(ann) > 0
    per_query: dict[int, int] = {}
    for r in ann:
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
        # same scoring function as the exact path
        assert abs(r.cos - exact[(r.query_id, r.vec_id)]) < 1e-12
    assert all(n <= K for n in per_query.values())
