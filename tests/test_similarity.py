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
    embedding_neardup_pairs,
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


def test_embedding_neardup_finds_planted_duplicate(spark):
    """An exact-duplicate vector pair (Hamming 0 — always blocked together)
    must surface with cos == 1; near-orthogonal vectors must not pair."""
    import random

    rng = random.Random(9)
    v = [rng.uniform(-1, 1) for _ in range(64)]
    w = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(1, v), (2, list(v)), (3, w)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.vec_a, r.vec_b): r.cos for r in embedding_neardup_pairs(df).collect()}
    assert (1, 2) in got and abs(got[(1, 2)] - 1.0) < 1e-12
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_neardup_pair_surfaces_once(spark):
    """The probe construction must emit each qualifying pair exactly once
    (distinct probes + one-direction filter), not once per matching probe."""
    import random

    rng = random.Random(9)
    v = [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(i, list(v)) for i in range(4)], "vec_id long, embedding array<double>"
    )
    pairs = [(r.vec_a, r.vec_b) for r in embedding_neardup_pairs(df).collect()]
    assert sorted(pairs) == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_int8_quantization_reconstruction_fidelity(spark):
    """The storage-shrink claim quantified: dequantized vectors (code/scale)
    stay within cosine 0.995 of the originals on real embeddings — the
    basis for 'int8 ANN costs ~1% recall'."""
    import numpy as np

    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.queries import QUERIES

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = QUERIES["embedding_quantize_int8"](spark, "/root/testdata/sf0.001")
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    for r in q.collect():
        if r.scale == 0.0:
            continue
        deq = np.array(r.vec_q.split(","), dtype=np.float64) / r.scale
        o = orig[r.vec_id]
        cos = float(o @ deq / (np.linalg.norm(o) * np.linalg.norm(deq)))
        assert cos >= 0.995, (r.vec_id, cos)
        # absmax scaling bounds the per-dim error by half a quantization step
        assert np.max(np.abs(o - deq)) <= (np.max(np.abs(o)) / 127) / 2 + 1e-12


def test_ivf_kmeans_recall_beats_label_quantizer(spark, emb):
    """The unsupervised trainer is not just label-free, it is better: on
    real embeddings, k-means IVF recall@10 vs the exact top-k is >= 0.6
    (measured 0.875 at sf0.01 / 0.975 at sf0.1) and strictly above the
    label-derived coarse quantizer's — labels are topic groups, not
    Voronoi cells, so their means partition the space worse."""
    from kafkastreamingetl_spark.operators.similarity import (
        ann_ivf_topk,
        fit_kmeans,
    )

    unlabeled = emb.select("vec_id", "embedding")
    q = self_queries(emb, 8)
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(emb, q, k=10).collect()}
    km = fit_kmeans(unlabeled)
    got_km = {
        (r.query_id, r.vec_id)
        for r in ann_ivf_topk(unlabeled, q, k=10, centroids=km).collect()
    }
    got_lab = {
        (r.query_id, r.vec_id) for r in ann_ivf_topk(emb, q, k=10).collect()
    }
    recall_km = len(exact & got_km) / len(exact)
    recall_lab = len(exact & got_lab) / len(exact)
    assert recall_km >= 0.6, (recall_km, recall_lab)
    assert recall_km > recall_lab, (recall_km, recall_lab)


def test_model_memo_bounded_under_churn(spark, emb, monkeypatch):
    """A week-long session fitting models over many distinct inputs must
    not accumulate unbounded state: the shared model memo evicts LRU past
    its cap (VERDICT r3 next-round #8). Entries are plain Python lists, so
    eviction is plain GC — nothing persisted cluster-side to leak. The
    cap is monkeypatched small so the churn stays cheap now that the
    production cap is sized above a full bench session's key count
    (VERDICT r13 item 3: eviction mid-session put a refit inside a timed
    lane)."""
    from kafkastreamingetl_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "_MODEL_CACHE_MAX", 6)
    for i in range(6 + 3):
        df = emb.filter(emb.vec_id < 16 + i).select("vec_id", "embedding")
        model = sim.fit_kmeans(df, k=2, n_iter=1)
        assert len(model) == 2
    assert len(sim._MODEL_CACHE) <= 6


def test_model_memo_logs_misses_not_hits(spark, emb):
    """bench.py's serving-only assertion reads _FIT_LOG: a miss appends
    the (kind, *params) key tail; a hit appends nothing — so a zero-delta
    log across the timed loop PROVES no lane paid a fit."""
    from kafkastreamingetl_spark.operators import similarity as sim

    df = emb.filter(emb.vec_id < 40).select("vec_id", "embedding")
    sim._MODEL_CACHE.clear()
    n0 = len(sim._FIT_LOG)
    sim.fit_kmeans(df, k=2, n_iter=1)
    assert len(sim._FIT_LOG) == n0 + 1
    assert sim._FIT_LOG[-1][0] == "kmeans"
    sim.fit_kmeans(df, k=2, n_iter=1)  # memo hit: no new log entry
    assert len(sim._FIT_LOG) == n0 + 1


def test_pq_index_serving_matches_inline_and_never_reads_vectors(
    spark, emb, tmp_path
):
    """The persisted-index path is the same math: build_pq_index then
    pq_topk_from_index returns row-for-row what inline pq_topk returns,
    and the serving plan's file inputs are only the index — the embedding
    column (the 64× bigger payload) is out of the serving path entirely."""
    from kafkastreamingetl_spark.operators.similarity import (
        build_pq_index,
        pq_topk,
        pq_topk_from_index,
    )

    path = str(tmp_path / "pq_index")
    build_pq_index(emb, path)
    # literal query set: the served plan must then have ZERO non-index
    # file inputs — vectors appear nowhere on the corpus side
    q = spark.createDataFrame(
        [
            (int(r.query_id), [float(x) for x in r.query_vec])
            for r in self_queries(emb, 4).collect()
        ],
        "query_id long, query_vec array<double>",
    )
    inline = sorted(
        (r.query_id, r.rank, r.vec_id, r.adc)
        for r in pq_topk(emb, q, k=5).collect()
    )
    served_df = pq_topk_from_index(spark, path, q, k=5)
    served = sorted(
        (r.query_id, r.rank, r.vec_id, r.adc) for r in served_df.collect()
    )
    assert served == inline
    files = served_df.inputFiles()
    assert files and all("pq_index" in f for f in files), files


def test_int8_topk_recall_near_exact(spark, emb):
    """The '~1% recall loss' claim for int8 serving, measured: recall@10
    vs float cosine top-k on real embeddings (1.0 at sf0.01 — pinned at
    >= 0.9 to absorb corpus changes)."""
    from kafkastreamingetl_spark.operators.similarity import int8_topk

    q = self_queries(emb, 8)
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(emb, q, k=10).collect()}
    got = {(r.query_id, r.vec_id) for r in int8_topk(emb, q, k=10).collect()}
    assert len(exact & got) / len(exact) >= 0.9


def test_embedding_covariance_symmetric_positive_diagonal(spark):
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.similarity import (
        embedding_covariance,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cells = {
        (r.dim_i, r.dim_j): r.cov
        for r in embedding_covariance(emb, n_dims=6).collect()
    }
    assert len(cells) == 36
    for i in range(1, 7):
        assert cells[(i, i)] > 0  # variances
        for j in range(1, 7):
            assert abs(cells[(i, j)] - cells[(j, i)]) < 1e-9  # symmetry


def test_embedding_covariance_mapinpandas_bit_equals_relational(spark):
    """The r16 mapInPandas partials execution must reproduce the
    relational d²-explode twin (= the oracle SQL shape) BIT-for-bit:
    Python's Decimal(repr(x)).quantize(4, HALF_UP) is the same value as
    Spark's double→DECIMAL(18,4) cast (both round the double's shortest
    decimal form), partial sums are exact ints, and the final cov
    evaluates in the same expression order."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.similarity import (
        _embedding_covariance_relational,
        embedding_covariance,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = embedding_covariance(emb)
    twin = _embedding_covariance_relational(emb)
    # dtypes, not full schema: mapInPandas output fields are nullable by
    # declaration while the explode's cast indices are not — the driver's
    # compare (and the oracle gate) key on names + types
    assert got.dtypes == twin.dtypes
    assert got.exceptAll(twin).count() == 0
    assert twin.exceptAll(got).count() == 0


def test_neardup_blocking_width_dial(spark):
    """The near-dup blocking width (n_planes) is the scale dial found by
    tools/scale_stress.py: widening the signature must (a) extend, never
    rewrite, the default plane set, (b) keep true near-dups (Hamming-0 at
    any width), and (c) monotonically shrink the admitted candidate set."""
    import random

    from kafkastreamingetl_spark.operators import similarity as sim

    assert sim.planes_for(14)[:8] == tuple(sim.ANN_PLANES)
    assert sim.planes_for(8) is sim.ANN_PLANES

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-0.3, 0.3) for _ in range(64)]) for i in range(200)
    ]
    rows.append((1000, list(rows[7][1])))  # exact dup of vec 7
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    n_admitted = {}
    for planes in (8, 14):
        got = {
            (r.vec_a, r.vec_b)
            for r in sim.embedding_neardup_pairs(
                emb, min_cos=0.999, n_planes=planes
            ).collect()
        }
        assert (7, 1000) in got, planes
        # admitted-candidate proxy: all pairs at min_cos=-1 (no verify cut)
        n_admitted[planes] = sim.embedding_neardup_pairs(
            emb, min_cos=-1.0, n_planes=planes
        ).count()
    assert n_admitted[14] <= n_admitted[8]


def test_embedding_label_drift_hand_computed(spark):
    """Two 2-dim 'snapshots' of one label: centroids and shift are exact
    decimal means; a label present in only one snapshot reports NULL for
    the missing side."""
    from kafkastreamingetl_spark.operators.similarity import (
        embedding_label_drift,
    )

    a = spark.createDataFrame(
        [(1, [1.0, 2.0], 7), (2, [3.0, 4.0], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    b = spark.createDataFrame(
        [(3, [5.0, 6.0], 7), (4, [7.0, 8.0], 7), (5, [1.0, 1.0], 9)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r.label, r.dim): r
        for r in embedding_label_drift(a, b, n_dims=2).collect()
    }
    r = got[(7, 1)]
    assert (r.n_first, r.n_second) == (2, 2)
    assert (r.c_first, r.c_second, r.shift) == (2.0, 6.0, 4.0)
    assert got[(7, 2)].shift == 4.0
    r9 = got[(9, 1)]
    assert r9.n_first == 0 and r9.c_first is None and r9.shift is None
    assert r9.c_second == 1.0


def test_hard_negative_topk_hand_computed(spark):
    """Negatives must be label-mismatched, self excluded, ranked by cosine
    with the vec_id tie-break; null-label rows never mined."""
    from kafkastreamingetl_spark.operators.similarity import (
        hard_negative_topk,
        self_labeled_queries,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),   # query: label 1
            (1, [1.0, 0.0], 1),   # identical direction but SAME label
            (2, [1.0, 0.1], 2),   # near miss, different label -> rank 1
            (3, [0.0, 1.0], 2),   # orthogonal, different label -> rank 2
            (4, [1.0, 0.0], None),  # null label: never a negative
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = hard_negative_topk(
        emb, self_labeled_queries(emb, n_queries=1), k=5
    ).collect()
    assert [(r.vec_id, r.rank, r.neg_label) for r in got] == [
        (2, 1, 2),
        (3, 2, 2),
    ]
    assert got[0].cos > got[1].cos
    # a null-label QUERY mines nothing (no `!=` match on either engine)
    nullq = spark.createDataFrame(
        [(9, [1.0, 0.0], None)],
        "query_id long, query_vec array<float>, query_label int",
    )
    assert hard_negative_topk(emb, nullq, k=5).count() == 0


# ---------------------------------------------------------------------------
# ann_recall_report (round 10)
# ---------------------------------------------------------------------------


def test_ann_recall_report_perfect_when_one_bucket(spark):
    """Co-directional vectors (one ray, varying magnitude) land on the
    same side of EVERY hyperplane — one bucket — so LSH compares the full
    corpus and recall@k is exactly 1.0 for every query (ties in cos break
    on vec_id identically on both paths)."""
    from kafkastreamingetl_spark.operators.similarity import (
        ANN_DIM,
        ann_recall_report,
    )

    rows = [
        (i, [(1.0 + 0.01 * i)] * ANN_DIM)
        for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = ann_recall_report(emb, k=10).collect()
    assert len(out) == 8
    for r in out:
        assert r.n_exact == 10
        assert r.n_approx == 10
        assert r.n_hit == 10
        assert r.recall == 1.0


def test_ann_recall_report_invariants_real_data(spark, sf_dir):
    """On the real corpus: hits never exceed either side, recall is the
    exact ratio, and the approximate side never returns more than k."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.similarity import (
        ann_recall_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ann_recall_report(emb, k=10).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hit <= min(r.n_exact, r.n_approx)
        assert r.n_approx <= 10
        assert r.recall == r.n_hit / r.n_exact


def test_rp_projection_matches_numpy_twin(spark):
    """The sign projection is exact arithmetic: quantize + ±1 bigint sums
    reproduce bit-identically in NumPy from the same md5-derived matrix."""
    import numpy as np

    from kafkastreamingetl_spark.operators.similarity import (
        RP_QUANT,
        _rp_signs,
        rp_project,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    vecs = rng.uniform(-0.5, 0.5, size=(20, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.p)
        for r in df.select(
            "vec_id", rp_project(F.col("embedding")).alias("p")
        ).collect()
    }
    S = np.array(_rp_signs(64))
    qv = np.round(vecs.astype(np.float64) * RP_QUANT).astype(np.int64)
    expected = qv @ S.T
    for i in range(20):
        assert got[i] == [int(x) for x in expected[i]]


def test_rp_topk_planted_neardup_survives_projection(spark):
    """The structure dedup/similarity serving actually cares about — a
    near-duplicate vector — survives the 64->16 projection at rank 1:
    JL noise is O(1/sqrt(d')) of the angle, and a near-dup's margin is
    ~1.0 vs ~0.0 for isotropic noise vectors."""
    import numpy as np

    from pyspark.sql import functions as F

    from kafkastreamingetl_spark.operators.similarity import rp_topk

    rng = np.random.default_rng(7)
    anchor = rng.uniform(-0.5, 0.5, 64)
    near = anchor + rng.uniform(-0.01, 0.01, 64)
    rows = [(0, [float(x) for x in anchor]), (1, [float(x) for x in near])]
    rows += [
        (i, [float(x) for x in rng.uniform(-0.5, 0.5, 64)])
        for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = rp_topk(emb, q, k=3).orderBy("rank").collect()
    assert top[0].vec_id == 1  # the planted near-dup, despite 4x reduction
    assert top[0].cos > 0.9


def test_rp_shortlist_recall_band_on_isotropic_worst_case(spark, sf_dir):
    """Pin the measured worst-case shortlist recall (documented in the
    rp_topk docstring): near-isotropic random vectors, exact-top-10
    margins below the projection noise. A band, not a point — the value
    is deterministic for fixed data but sf_dir varies across harnesses."""
    from kafkastreamingetl_spark.catalog import load_table
    from kafkastreamingetl_spark.operators.similarity import (
        cosine_topk,
        rp_topk,
        self_queries,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = self_queries(emb)
    exact: dict[int, set[int]] = {}
    for r in cosine_topk(emb, q).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    short: dict[int, set[int]] = {}
    for r in rp_topk(emb, q, k=50).collect():
        short.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(exact[qi] & short.get(qi, set())) for qi in exact)
    recall = hits / (len(exact) * 10)
    assert 0.25 <= recall <= 0.85, recall  # worst-case band, see docstring


# ---------------------------------------------------------------------------
# Embedding QC report (round 12)
# ---------------------------------------------------------------------------


def test_embedding_qc_counts_every_damage_class(spark):
    from kafkastreamingetl_spark.operators.similarity import embedding_qc_report

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # healthy, norm2 = 1
        (1, [0.0, 0.0, 0.0, 0.0]),          # zero vector
        (2, [float("nan"), 0.0, 0.0, 0.0]),  # non-finite
        (3, [float("inf"), 0.0, 0.0, 0.0]),  # non-finite
        (4, [1.0, 0.0]),                     # wrong dimension
        (5, None),                           # NULL vector
        (6, [0.5, 0.5, 0.5, 0.5]),           # healthy, norm2 = 1
        (7, [None, 1.0, 0.0, 0.0]),          # NULL element (own class)
        (8, [None, float("nan"), 0.0, 0.0]),  # NULL elem wins over nonfinite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_qc_report(df, dim=4).collect()[0]
    assert r.n_vectors == 9
    assert r.n_null_vec == 1
    assert r.n_wrong_dim == 1
    assert r.n_null_elem == 2
    assert r.n_nonfinite == 2
    assert r.n_zero_vec == 1
    assert r.n_healthy == 3
    assert r.min_norm2_micro == 0
    assert r.max_norm2_micro == 1_000_000
    assert abs(r.avg_norm2_micro - 2_000_000 / 3) < 1e-9


def test_embedding_qc_null_element_engine_parity(spark, tmp_path):
    """ADVICE r12 (medium): Spark's F.exists is three-valued on NULL
    elements while DuckDB's list_filter drops NULL predicate rows — the
    [NULL,1,0,0] row used to land in no class on Spark and in `healthy`
    on DuckDB. The explicit null_elem class must make both engines agree
    on planted NULL-element rows the sf testdata never contains."""
    import duckdb

    from kafkastreamingetl_spark.operators.similarity import (
        embedding_qc_report,
        sql_embedding_qc_report,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [None, 1.0, 0.0, 0.0]),       # the ADVICE repro row
        (2, [None, float("inf"), 0.0, 0.0]),
        (3, None),
        (4, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got_spark = [tuple(r) for r in embedding_qc_report(df, dim=4).collect()]

    pq = str(tmp_path / "emb.parquet")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    got_duck = [
        tuple(r)
        for r in con.execute(sql_embedding_qc_report(dim=4)).fetchall()
    ]
    assert got_spark == got_duck
    r = got_spark[0]
    # columns: n_vectors, n_null_vec, n_wrong_dim, n_null_elem,
    #          n_nonfinite, n_zero_vec, n_healthy, min, max, avg
    assert r[:7] == (5, 1, 0, 2, 0, 1, 2)


def test_embedding_qc_all_healthy_corpus(spark):
    from kafkastreamingetl_spark.operators.similarity import embedding_qc_report

    df = spark.createDataFrame(
        [(i, [0.0] * 63 + [2.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    r = embedding_qc_report(df).collect()[0]
    assert (r.n_null_vec, r.n_wrong_dim, r.n_nonfinite, r.n_zero_vec) == (
        0,
        0,
        0,
        0,
    )
    assert r.n_healthy == 5
    assert r.min_norm2_micro == r.max_norm2_micro == 4_000_000
