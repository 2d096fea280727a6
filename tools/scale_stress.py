"""Measured 100×-scale evidence: run the heaviest registered queries on
×K generated frames and record wall growth (VERDICT r7 item 5 / r8 item 5).

The per-round bench proves speed at sf0.1; the plan audits argue the shapes
survive 100×. This tool converts that argument into measurement: it
materializes ×10 and ×50 copies of the sf0.1 tables the heavy queries read
(documents / embeddings / events — content-DIVERSE replicas, see below),
times each query at every scale on the same local[32] session, and writes
``SCALE_STRESS.json`` at the repo root:

    python tools/scale_stress.py            # full ×1/×10/×50 run
    SCALES=10 python tools/scale_stress.py  # quicker single-scale run

Replication must not manufacture a pathological corpus, so replicas are
content-diverse, not byte-copies:

- ``documents``: replica r of a doc keeps its vocabulary but deterministically
  SHUFFLES word order (sort words by ``md5(word, doc_id, r)``) — token/vocab
  stats scale linearly while word-shingle Jaccard between replicas collapses,
  so near-dup candidate volume grows ~linearly like a real diverse corpus
  (byte-copies would grow it quadratically in K by construction).
- ``embeddings``: replicas come in PAIRS — even replica r is an anchor
  displaced by a big (±0.4/coord ≈ cosine ~0.5 on these unit-norm 64-d
  vectors) hash-derived offset keyed by (vec_id, r/2); odd r adds a tiny
  (±0.01/coord) offset to its anchor. Every vector thus has exactly ONE
  near-duplicate partner: the near-dup RATE stays constant as K grows
  (like a real corpus) instead of every base vector becoming a K-clique —
  the first ×50 run used a single small jitter and manufactured 50-cliques
  whose pair volume grew K², inflating the semantic-cluster closure build
  ~40× superlinearly (an artifact of the generator, not the operator).
  Replica 0 keeps the original vector, replica 1 is its near-dup.
- ``events``: replica r shifts ``ts`` by r seconds and remaps ``event_id``;
  ``user_id`` is kept, so per-user state (windows, RFM cuts) grows ×K — the
  harsher direction for the windowed operators.

The "sublinear" criterion: wall(×K) < K × wall(×1) per query. Fixed driver
overhead makes small ratios easy at these sizes; the point is catching a
superlinear blowup (candidate-pair explosion, state OOM), which would blow
straight past K.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kafkastreamingetl_spark.catalog import load_table  # noqa: E402
from kafkastreamingetl_spark.session import get_test_spark  # noqa: E402
from __spark_entry__ import queries  # noqa: E402
from bench import _bench_action  # noqa: E402  — r14: full-execution action
# (the old .count() action let Catalyst prune Window/Sort operators, so
# pre-r14 SCALE_STRESS walls under-measured window lanes 1.2–2.4×; this
# artifact is regenerated whenever the action changes)

BASE_DIR = "/root/testdata/sf0.1"
WORK_DIR = "/tmp/spark_graft_scale_stress"

# The most expensive registered queries by the committed per-query bench
# (BENCH_DETAIL.json; identical top set at sf0.01 and sf0.1 within noise):
# the ANN serving family (embeddings), the near-dup cluster pipeline
# (documents), the exact-ntile RFM census (events), and the
# positioned-gram substring join (documents; its serving wall INCLUDES the
# gram materialization — the cache is cleared before the timing, and the
# query has no separate trainer to prewarm).
HEAVY_QUERIES = [
    "embedding_ann_multitable",
    "embedding_pq_kmeans_topk",
    "embedding_ivf_kmeans_topk",
    "neardup_cluster_sizes",
    "user_rfm_segments",
    "embedding_pq_topk",
    "embedding_clusters",
    "embedding_ann_multiprobe",
    "embedding_ann_topk",
    "embedding_ivf_topk",
    "substring_run_pairs",
    # not expensive at sf0.1, but its CLAIM is a scale claim: the
    # Misra-Gries sketch pass must stay O(capacity) memory and the verify
    # shuffle candidate-bounded as the token stream grows ×K
    "frequent_tokens_sketch",
    # the composed text-dedup lane (VERDICT r9 item 5): signatures →
    # banded candidates → cluster closure → per-doc disposition. Its
    # shuffles are posting-list-shaped ((band, sig) equi-joins, never
    # all-pairs) — the remaining unmeasured 100 TB claim before this run.
    # neardup_clusters serves from the prewarmed closure memo (the build
    # is timed under prewarm_neardup_clusters and held to the same bound);
    # dedup_disposition layers the exact-hash lane + survivor joins on it.
    "minhash_signatures",
    "neardup_candidates",
    "neardup_clusters",
    "dedup_disposition",
    # round-10 dedup-lane additions whose claims are scale claims: the
    # PageRank rounds must stay (node, score)-shaped after the pinned
    # edge build, and the incremental join must track the increment side
    "neardup_pagerank",
    "incremental_neardup_documents",
    # remaining round-10 additions (VERDICT r10 item 5). The events
    # replication keeps user_id, so user_interarrival_stats' per-user lag
    # window grows xK per user — the harsh direction for windowed state;
    # the two text reports must stay one-explode-one-agg shaped (their
    # (doc, class) / (gram) count state is bounded by corpus bytes).
    "user_interarrival_stats",
    "doc_char_entropy",
    "bigram_pmi_collocations",
    # round-11 scan-audit queries whose fix persists a derived table: the
    # claim is that the cache stays vocabulary-sized (tf: (doc, term)
    # collapsed; lm: unigram counts; mix: per-source counts) while the
    # corpus grows xK — a cache that secretly tracked corpus bytes would
    # show up here as superlinear wall or heap pressure
    "tfidf_top_terms",
    "doc_lm_score",
    "temperature_mix_sample",
    # round-12 dedup-lane addition: marginal work on top of the prewarmed
    # closure must stay one cluster-keyed aggregate (cluster-count-sized
    # output) as the corpus grows xK
    "neardup_quality_survivors",
    # round-12 retrieval lane: the per-doc run-length tf is shuffle-free
    # by construction, so the scaling claim is that wall tracks the
    # posting-list volume (sum of df over query terms) — the broadcast
    # query dictionary and the (query, doc)-keyed combine must stay flat
    # per unit corpus as documents grow xK
    "bm25_topk",
    # round-13 final-cohort additions whose claims are scale claims: the
    # contamination diff's shuffles must stay contamination-sized (batch
    # sets broadcast; only matched hashes / colliding grams return) and
    # the trend's hash-keyed window must track corpus size linearly
    "batch_contamination_diff",
    "source_dedup_trend",
]

# Round-11 sketch lanes (VERDICT r11 item 6): their whole reason to exist
# is scale, so each is timed NEXT TO its exact twin at every stress point —
# the claim under test is that the sketch's advantage WIDENS as the corpus
# grows (the inverse of the honest value_percentiles_tdigest note, where
# the exact lane wins on a bounded domain). sketch name -> exact twin.
SKETCH_LANES = {
    "source_overlap_minhash": "source_overlap_matrix",
    "user_rfm_segments_approx": "user_rfm_segments",
    # round 12: approx_percentile threshold cuts vs the exact per-language
    # rank window — the sketch's advantage is the removed per-language sort
    "lm_bucket_mix_approx": "lm_score_bucket_mix",
}

_SHUFFLE_TEXT = (
    "array_join(transform(array_sort(transform(split(text, ' '), "
    "w -> named_struct('k', md5(concat(w, cast(doc_id as string), "
    "cast(_r as string))), 'w', w))), s -> s.w), ' ')"
)
_JITTER_VEC = (
    "transform(embedding, (v, i) -> cast(v "
    # pair anchor displacement: big for pairs >= 1, zero for pair 0 so
    # replicas 0/1 stay anchored on the original vector
    "+ if(_r >= 2, (pmod(hash(vec_id, cast(_r / 2 as int), i), 801) - 400)"
    " / 1000.0, 0.0d) "
    # odd replica = near-dup of its even anchor (tiny offset)
    "+ if(_r % 2 = 1, (pmod(hash(vec_id, _r, i, 7), 21) - 10) / 1000.0, "
    "0.0d) as float))"
)


def _replicate(df, k: int):
    return df.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))


def build_scaled_dir(spark, k: int) -> str:
    """Materialize a ×k copy of BASE_DIR under WORK_DIR/x{k}; idempotent
    (reuses an existing complete build so reruns iterate on timings)."""
    out = os.path.join(WORK_DIR, f"x{k}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = _replicate(load_table(spark, BASE_DIR, "documents"), k)
    docs = docs.select(
        (F.col("doc_id") * k + F.col("_r")).alias("doc_id"),
        F.when(F.col("_r") == 0, F.col("text"))
        .otherwise(F.expr(_SHUFFLE_TEXT))
        .alias("text"),
        "lang",
        "source",
        "_r",
    )
    docs = docs.select(
        "doc_id", "text", "lang", "source", F.length("text").alias("n_chars")
    )
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = _replicate(load_table(spark, BASE_DIR, "embeddings"), k)
    emb = emb.select(
        (F.col("vec_id") * k + F.col("_r")).alias("vec_id"),
        F.expr(_JITTER_VEC).alias("embedding"),
        "label",
    )
    emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    ev = _replicate(load_table(spark, BASE_DIR, "events"), k)
    ev = ev.select(
        (F.col("event_id") * k + F.col("_r")).alias("event_id"),
        (
            F.col("ts")
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("_r"))
        ).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    for name in os.listdir(BASE_DIR):
        if name.endswith(".parquet") and not os.path.exists(
            os.path.join(out, name)
        ):
            shutil.copy(os.path.join(BASE_DIR, name), os.path.join(out, name))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def _time_queries(spark, qs, sf_dir: str, n_planes: int) -> tuple[dict, dict]:
    """(serving walls, fit walls) at sf_dir. Mirrors bench.py: trainers and
    cluster-closure builds are timed separately FIRST so per-query numbers
    are serving-only.

    ``n_planes`` tunes the embedding near-dup blocking width to the corpus
    size (≈ 8 + log2(K)) — the dial :func:`similarity.planes_for` documents.
    The FIRST stress run measured the registered default (8 planes) at
    every scale and caught the quadratic: 15 s → 560 s closure build for
    5× the vectors (recorded under "found" in the report). Scaling the
    width is the fix, so the committed numbers measure the tuned
    configuration; everything else runs the registered queries verbatim.
    """
    from kafkastreamingetl_spark.operators import similarity as sim

    fit: dict[str, float] = {}
    sim._MODEL_CACHE.clear()
    emb = load_table(spark, sf_dir, "embeddings")

    def _clusters(sp, d):
        return sim.embedding_clusters(
            load_table(sp, d, "embeddings"), n_planes=n_planes
        )
    for name, fn in (
        ("fit_label_centroids", lambda: sim.fit_label_centroids(emb)),
        (
            "fit_kmeans",
            lambda: sim.fit_kmeans(emb.select("vec_id", "embedding")),
        ),
        ("fit_pq_codebook_label", lambda: sim.fit_pq_codebook_label(emb)),
        (
            "fit_pq_codebook_kmeans",
            lambda: sim.fit_pq_codebook_kmeans(
                emb.select("vec_id", "embedding")
            ),
        ),
    ):
        t0 = time.perf_counter()
        fn()
        fit[name] = round(time.perf_counter() - t0, 3)
    for pw, fn in (
        ("neardup_clusters", qs["neardup_clusters"]),
        ("embedding_clusters", _clusters),
    ):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _bench_action(fn(spark, sf_dir))
        fit[f"prewarm_{pw}"] = round(time.perf_counter() - t0, 3)

    walls: dict[str, float] = {}
    for name in HEAVY_QUERIES:
        fn = _clusters if name == "embedding_clusters" else qs[name]
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _bench_action(fn(spark, sf_dir))
        walls[name] = round(time.perf_counter() - t0, 3)
    return walls, fit


def _time_sketch_lanes(spark, qs, sf_dir: str) -> dict:
    """Sketch lane vs exact twin, both cache-cold, at one stress point.
    Exact twins reuse the main-lane wall when the twin is in
    HEAVY_QUERIES; otherwise the twin is timed here the same way."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS

    out: dict[str, dict] = {}
    for sketch, exact in SKETCH_LANES.items():
        lanes = {}
        for label, fn in (
            ("sketch_sec", APPROX_VARIANTS[sketch]),
            ("exact_sec", qs[exact]),
        ):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _bench_action(fn(spark, sf_dir))
            lanes[label] = round(time.perf_counter() - t0, 3)
        lanes["speedup"] = round(
            lanes["exact_sec"] / max(lanes["sketch_sec"], 1e-3), 2
        )
        out[sketch] = {"exact_twin": exact, **lanes}
    return out


def _planes_at(k: int) -> int:
    import math

    return 8 + max(0, round(math.log2(k))) if k > 1 else 8


#: languages for the fan-out fixture (VERDICT r12 item 3): the sf corpus is
#: effectively single-language, so the CCNet bucket sketch's entire lever —
#: replacing the per-language rank-window SORT with one approx_percentile
#: aggregation — never shows at any replication scale. ~100 synthetic
#: languages is the realistic web-corpus shape (CCNet ships 174).
LANG_FANOUT = 100


def build_lang_fanout_dir(spark, scaled_dir: str, n_langs: int = LANG_FANOUT) -> str:
    """documents from ``scaled_dir`` with ``lang`` deterministically
    relabeled to ``n_langs`` synthetic values (salted hash of doc_id —
    the LM scoring and tertile cuts only GROUP by lang, so a relabel is a
    faithful fan-out fixture; content is untouched). Other tables are not
    copied: both bucket-mix lanes and quality_percentile_filter read only
    documents."""
    out = scaled_dir.rstrip("/") + f"_lang{n_langs}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, scaled_dir, "documents")
    docs = docs.withColumn(
        "lang",
        F.concat(F.lit("syn"), F.pmod(F.hash("doc_id", F.lit(41)), F.lit(n_langs))),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def _time_lang_fanout(spark, qs, scaled_dir: str) -> dict:
    """Both CCNet bucket-mix lanes + the per-language quality filter on the
    ``n_langs``-language relabel of the given stress dir, cache-cold. The
    claim under test: the sketch lane's advantage exists exactly when
    language cardinality does (its absence on the single-language corpus
    was round 12's honest 0.71–0.87× note)."""
    from kafkastreamingetl_spark.queries import APPROX_VARIANTS

    fdir = build_lang_fanout_dir(spark, scaled_dir)
    out: dict[str, float] = {"n_langs": LANG_FANOUT, "base": scaled_dir}
    for label, fn in (
        ("exact_sec", qs["lm_score_bucket_mix"]),
        ("sketch_sec", APPROX_VARIANTS["lm_bucket_mix_approx"]),
        ("quality_percentile_filter_sec", qs["quality_percentile_filter"]),
    ):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _bench_action(fn(spark, fdir))
        out[label] = round(time.perf_counter() - t0, 3)
    out["speedup"] = round(out["exact_sec"] / max(out["sketch_sec"], 1e-3), 2)
    return out


def main() -> None:
    scales = [
        int(s) for s in os.getenv("SCALES", "10,50").split(",") if s.strip()
    ]
    spark = get_test_spark("kafkastreamingetl_spark_scale_stress")
    qs = queries()

    from bench import _action

    report: dict = {"base_dir": BASE_DIR, "action": _action(), "scales": {}, "criterion": (
        "wall(xK) < K * wall(x1) per query and per fit/prewarm (a "
        "superlinear blowup in candidate volume or state would blow past "
        "K); every run completing on the test heap is the no-OOM evidence"
    ), "found": (
        "run 1 (1 GiB default driver heap): OOM in shingle aggregation at "
        "x50 -> session.py now sizes the local JVM (16g). run 2 (fixed "
        "8-plane blocking at every scale): embedding_clusters closure "
        "build 15 s @x10 -> 560 s @x50, O(n^2/2^planes) candidate volume "
        "-> n_planes is now a parameter scaled ~8+log2(K) here "
        "(similarity.planes_for documents the dial)"
    )}
    base_walls, base_fit = _time_queries(spark, qs, BASE_DIR, _planes_at(1))
    report["scales"]["x1"] = {
        "wall_sec": base_walls,
        "fit_sec": base_fit,
        "blocking_planes": _planes_at(1),
        "sketch_lanes": _time_sketch_lanes(spark, qs, BASE_DIR),
    }
    print(f"x1: {sum(base_walls.values()):.1f}s serving", file=sys.stderr)

    violations: list[str] = []
    for k in scales:
        t0 = time.perf_counter()
        sdir = build_scaled_dir(spark, k)
        build_s = round(time.perf_counter() - t0, 1)
        walls, fit = _time_queries(spark, qs, sdir, _planes_at(k))
        ratios = {
            n: round(walls[n] / max(base_walls[n], 1e-3), 2)
            for n in HEAVY_QUERIES
        }
        # fits/prewarms are held to the same bound: the first x50 run's
        # superlinear cluster-closure build (misdesigned generator) slipped
        # past an assertion that only covered serving walls
        fit_ratios = {
            n: round(fit[n] / max(base_fit.get(n, 0), 1e-3), 2) for n in fit
        }
        report["scales"][f"x{k}"] = {
            "wall_sec": walls,
            "fit_sec": fit,
            "ratio_vs_x1": ratios,
            "fit_ratio_vs_x1": fit_ratios,
            "build_sec": build_s,
            "blocking_planes": _planes_at(k),
            "sublinear": {n: ratios[n] < k for n in HEAVY_QUERIES},
            "sketch_lanes": _time_sketch_lanes(spark, qs, sdir),
        }
        violations += [f"x{k}:{n}" for n in HEAVY_QUERIES if ratios[n] >= k]
        violations += [f"x{k}:{n}" for n, r in fit_ratios.items() if r >= k]
        print(
            f"x{k}: {sum(walls.values()):.1f}s serving, "
            f"worst ratio {max(ratios.values()):.1f}",
            file=sys.stderr,
        )

    # Multi-language fan-out fixture at the LARGEST stress scale (and ×1
    # for the per-corpus-size contrast): the axis replication can't grow.
    if scales:
        big = os.path.join(WORK_DIR, f"x{max(scales)}")
        report["lang_fanout"] = {
            "x1": _time_lang_fanout(spark, qs, BASE_DIR),
            f"x{max(scales)}": _time_lang_fanout(spark, qs, big),
        }
        for blk in report["lang_fanout"].values():
            print(
                f"lang_fanout {blk['base']}: exact {blk['exact_sec']}s vs "
                f"sketch {blk['sketch_sec']}s (speedup {blk['speedup']})",
                file=sys.stderr,
            )

    report["violations"] = violations
    with open(os.path.join(REPO, "SCALE_STRESS.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"violations": violations, "scales": scales}))
    spark.stop()
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
