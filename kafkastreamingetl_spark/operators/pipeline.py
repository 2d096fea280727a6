"""The composed training-data pipeline: quality → dedup → label → sample.

One declarative plan chaining the engine's LLM-data operators — the
north-star composition (SURVEY.md §7.1 step 6; no analogue in the
reference, whose pipeline ends at the daily rollup):

    documents
      → inline quality metrics + filter      (text.doc_quality semantics)
      → near-dup cluster removal             (dedup.neardup_dedup semantics)
      → join embeddings for labels           (J1-family equi-join)
      → per-label top-k stratified sample    (W1-family rank)

Composition notes for 100 TB:
- quality metrics are computed INLINE on the main projection — composing
  ``doc_quality(df).join(df)`` instead would scan `documents` twice;
- the near-dup loser set reuses the persisted shingle features
  (dedup.shingle_features memo), so the cluster branch adds no second
  text-hashing pass, and the anti-join's right side is only the
  non-survivors (duplicate-fraction-sized → AQE broadcasts it);
- the embeddings join carries (doc_id, label) only — vectors are pruned
  out before the join, so the exchange never moves 256-byte arrays;
- the final rank partitions by `label` (bounded cardinality). At extreme
  scale a two-stage top-k (similarity._topk_two_stage shape) would drop
  the single-partition-per-label ceiling; with 10 labels × k rows kept,
  row_number per label is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import NEARDUP_MIN_JACCARD, neardup_clusters
from .text import sql_tokens, tokens

# Quality gate defaults, chosen against the testdata distributions so the
# filter is exercised (drops the short/repetitive tail) without emptying
# the corpus: n_tokens p10 ≈ 21, type_token_ratio p10 ≈ 0.32.
MIN_TOKENS = 20
MIN_TYPE_TOKEN_RATIO = 0.30


def training_set_sample(
    documents: DataFrame,
    embeddings: DataFrame,
    *,
    k_per_label: int = 10,
    min_tokens: int = MIN_TOKENS,
    min_ttr: float = MIN_TYPE_TOKEN_RATIO,
    min_jaccard: float = NEARDUP_MIN_JACCARD,
) -> DataFrame:
    """Per-label top-``k_per_label`` quality-ranked, deduplicated sample.

    Returns (doc_id, label, n_tokens, quality_score, sample_rank) where
    quality_score is the type-token ratio (exact double division — the
    rank ordering is bit-stable across engines) and sample_rank is the
    deterministic within-label position (score DESC, doc_id ASC).
    """
    t = tokens("text")
    n_tok = F.size(t)
    ttr = F.size(F.array_distinct(t)).cast("double") / n_tok
    qual = documents.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        ttr.alias("quality_score"),
    ).filter((F.col("n_tokens") >= min_tokens) & (F.col("quality_score") >= min_ttr))

    losers = (
        neardup_clusters(documents, min_jaccard=min_jaccard)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    deduped = qual.join(losers, "doc_id", "left_anti")

    labels = embeddings.select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    labeled = deduped.join(labels, "doc_id")

    w = Window.partitionBy("label").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        labeled.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k_per_label)
        .select("doc_id", "label", "n_tokens", "quality_score", "sample_rank")
    )


def sql_training_set_sample(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    *,
    k_per_label: int = 10,
    min_tokens: int = MIN_TOKENS,
    min_ttr: float = MIN_TYPE_TOKEN_RATIO,
    min_jaccard: float = NEARDUP_MIN_JACCARD,
) -> str:
    from .dedup import _sql_components_ctes

    w = sql_tokens("text")
    return f"""
    WITH RECURSIVE {_sql_components_ctes(doc_table, "text", min_jaccard)},
    qual AS (
        SELECT doc_id,
               len({w})::BIGINT AS n_tokens,
               len(list_distinct({w}))::DOUBLE / len({w}) AS quality_score
        FROM {doc_table}
        WHERE n_tokens >= {min_tokens} AND quality_score >= {min_ttr}
    ),
    deduped AS (
        SELECT q.* FROM qual q
        ANTI JOIN (
            SELECT node FROM clusters WHERE node <> cluster_id
        ) l ON q.doc_id = l.node
    )
    SELECT d.doc_id, e.label, d.n_tokens, d.quality_score,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY e.label
               ORDER BY d.quality_score DESC NULLS LAST, d.doc_id ASC NULLS FIRST
           ) AS INT) AS sample_rank
    FROM deduped d
    JOIN {emb_table} e ON d.doc_id = e.vec_id
    QUALIFY sample_rank <= {k_per_label}
    """
