"""Exact distributed rank statistics: ``ntile`` / global rank without a
single-partition window sort.

The naive decile report — ``ntile(10) OVER (ORDER BY ...)`` with no
PARTITION BY — funnels the entire frame through ONE task (Spark warns
``WindowExec: No Partition Defined``). Fine on a 60k-row test; at 100 TB a
one-row-per-user frame is billions of rows through a single sort. The
reference never ranks globally at all (its pandas batch job,
airflow/dags/kafka_spark_etl.py:64-78, fits in one process by design), so
this operator is where the Spark re-expression must diverge from both: the
semantics of a total order, the execution of a range shuffle.

:func:`with_exact_ntile` reproduces ``ntile(n)``'s exact semantics — bucket
sizes ``ceil(N/n)`` for the first ``N mod n`` buckets, ``floor(N/n)`` after
— with a fully distributed plan:

1. One pass computes ~``num_range_buckets`` quantile edges of the leading
   order column (``approx_percentile``, fixed-size mergeable sketch) and
   collects them as LITERALS (an edge-count-sized collect, same class as
   the k-means centroid fits in operators/similarity.py). Literal edges
   make the range bucket a PURE FUNCTION of the row — both downstream
   branches (ranks and offsets) agree on it under any re-execution,
   where ``spark_partition_id`` after ``repartitionByRange`` does not
   (sampled bounds can differ between an exchange's re-evaluations, which
   is exactly the nondeterminism AQE re-planning exposes).
2. ``row_number`` windowed BY that range bucket: one hash exchange, local
   in-partition sorts — the same per-partition work a global sort does,
   minus the single-task funnel.
3. Per-bucket row counts — a ≤``num_range_buckets``-row aggregate — turned
   into cumulative offsets and the grand total by a window over that tiny
   frame, broadcast back.
4. ``global rank = in-bucket row_number + preceding-bucket offset``; the
   ntile bucket is closed-form integer arithmetic over (rank, N, n).

Exactness does not depend on where the sampled edges fall: ranks come from
actual row positions, so a skewed sketch only costs balance, never the
answer. Rows sharing the leading order value always share a range bucket,
so cross-bucket order is consistent with any (leading, tie-break...) total
order; a heavily repeated leading value degrades balance exactly like any
range partitioning on that key would. With a tie-broken (unique) order key
the result is deterministic; with ties it is exactly as nondeterministic
as ``ntile`` itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Range-bucket count for the rank exchange: several buckets per shuffle
# partition so hashing buckets onto reducers stays balanced. The offsets
# frame is bounded by this constant regardless of data size.
DEFAULT_RANGE_BUCKETS = 128

_HELPER_COLS = ("_rbucket", "_rn", "_off", "_total")


def _edge_literals(
    df: DataFrame, leading: Column, num_edges: int
) -> list:
    """Interior quantile edges of the leading order column, collected as
    plain Python values (``num_edges``-sized — a model fit, not a row
    collect). Nulls sort first in the window order and compare to nothing,
    so the sketch runs on non-null values only and null rows fall into
    bucket 0 by the ``e < x`` rule."""
    qs = [i / (num_edges + 1.0) for i in range(1, num_edges + 1)]
    row = df.select(leading.alias("_k")).agg(
        F.approx_percentile(
            "_k", F.array(*[F.lit(q) for q in qs])
        ).alias("_edges")
    ).first()
    edges = row["_edges"] if row and row["_edges"] is not None else []
    # strictly increasing edges: duplicates add empty buckets, not wrong
    # answers, but deduping keeps the tiny frames tiny
    out: list = []
    for e in edges:
        if e is not None and (not out or e > out[-1]):
            out.append(e)
    return out


def with_exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[str | Column],
    *,
    bucket_col: str = "bucket",
    num_range_buckets: int = DEFAULT_RANGE_BUCKETS,
) -> DataFrame:
    """``df`` plus an INT ``bucket_col`` equal to
    ``ntile(n) OVER (ORDER BY order_cols ASC NULLS FIRST)`` — computed with
    a quantile-edge range bucketing instead of a single-partition global
    sort.

    ``order_cols`` should end in a unique tie-breaker for a deterministic
    answer (both registered callers do: (ltv, user_id), (zval, event_id)).
    The leading order column drives the range bucketing and must be
    NUMERIC (``approx_percentile``'s domain) — cast dates/timestamps to
    epoch numbers first. Ascending NULLS FIRST, Spark's window default.
    """
    if any(c in df.columns for c in _HELPER_COLS):
        raise ValueError(f"input must not contain helper columns {_HELPER_COLS}")
    ordering = [
        F.col(c).asc_nulls_first() if isinstance(c, str) else c
        for c in order_cols
    ]
    lead = order_cols[0]
    lead_col = F.col(lead) if isinstance(lead, str) else lead
    edges = _edge_literals(df, lead_col, num_range_buckets - 1)

    # bucket = count of edges strictly below the leading value: a pure
    # row-local expression (codegen-eligible CASE chain over literals).
    # NULL leading values fail every `e < x` test -> bucket 0 (nulls
    # first). Equal leading values always share a bucket.
    rb = F.lit(0)
    for e in edges:
        rb = rb + F.when(F.lit(e) < lead_col, 1).otherwise(0)
    bucketed = df.withColumn("_rbucket", rb.cast("int"))

    w_local = Window.partitionBy("_rbucket").orderBy(*ordering)
    rn = bucketed.withColumn("_rn", F.row_number().over(w_local))

    counts = rn.groupBy("_rbucket").agg(F.count(F.lit(1)).alias("_cnt"))
    # <= num_range_buckets rows (bounded by construction). partitionBy a
    # literal: the frame IS single-partition by design, and declaring that
    # keeps Spark's "No Partition Defined" warning an honest signal for
    # the unbounded-frame mistakes it exists to catch.
    w_cum = (
        Window.partitionBy(F.lit(0))
        .orderBy("_rbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(F.lit(0))
        .orderBy("_rbucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offsets = counts.select(
        "_rbucket",
        F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias("_total"),
    )

    ranked = rn.join(F.broadcast(offsets), "_rbucket")
    # ntile(n) over N rows: the first N%n buckets take ceil(N/n) rows, the
    # rest floor(N/n). Integer-exact: DIV keeps everything in bigint; the
    # global rank is _rn + _off.
    rank = "(CAST(_rn AS BIGINT) + _off)"
    bucket = F.expr(
        f"""CAST(CASE
            WHEN {rank} <= (_total % {n}) * ((_total DIV {n}) + 1)
            THEN ({rank} - 1) DIV ((_total DIV {n}) + 1) + 1
            ELSE (_total % {n})
                 + ({rank} - (_total % {n}) * ((_total DIV {n}) + 1) - 1)
                   DIV greatest(_total DIV {n}, 1)
                 + 1
        END AS INT)"""
    )
    return ranked.withColumn(bucket_col, bucket).drop(*_HELPER_COLS)
