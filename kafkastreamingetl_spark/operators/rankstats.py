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
— with a fully distributed plan (the declarative form of RDD
``zipWithIndex``):

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order key: one
   exchange with sampled bounds, local sorts — the same per-partition work
   a global sort does, minus the single-task funnel.
2. ``monotonically_increasing_id()`` over the sorted partitions encodes
   (partition id, in-partition offset) in its upper/lower bits — both the
   partition id AND the local row number in ONE narrow projection, no
   window over the data and no second exchange.
3. A LAZY ``localCheckpoint`` pins that frame before it forks into the
   rank stream and the per-partition-count stream. This is load-bearing
   for CORRECTNESS, not just cost: without it the two branches re-execute
   the range exchange independently, and two instantiations can sample
   DIFFERENT bounds (observed under AQE as rank/total drift — a 33rd
   bucket from a 32-tile). The checkpoint makes the partitioning a single
   materialized fact both branches share; on a cluster with executor-loss
   concerns swap for reliable ``checkpoint()`` (same call shape).
4. Per-partition counts — a P-row aggregate — become cumulative offsets
   and the grand total via a P×P broadcast self-join over that tiny frame
   (no window functions anywhere: nothing in the plan can regress into an
   unpartitioned window sort), broadcast back;
   ``global rank = offset + local row number``; the ntile bucket is
   closed-form integer arithmetic over (rank, N, n).

Exactness does not depend on where the sampled range bounds fall: ranks
come from actual row positions, so a skewed sample only costs balance,
never the answer. With a tie-broken (unique) order key the result is
deterministic; with ties it is exactly as nondeterministic as ``ntile``
itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fallback width of the rank exchange, used only when the session's
# ``spark.sql.shuffle.partitions`` is unreadable (e.g. set to "auto" on a
# vendor runtime). The default tracks the session at CALL time — a
# hardcoded width would under-parallelize the range sort on a cluster
# whose shuffle width is thousands. Exactness never depends on the width
# (ranks come from actual row positions); it only sets balance, and the
# offsets frame stays width-sized either way.
_FALLBACK_RANK_PARTITIONS = 200

# monotonically_increasing_id layout: partition id in the upper 31 bits,
# record-within-partition in the lower 33.
_MID_OFFSET_BITS = 33
_MID_OFFSET_MASK = (1 << _MID_OFFSET_BITS) - 1

_HELPER_COLS = ("_mid", "_pid", "_rn", "_off", "_total")


def with_exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[str | Column],
    *,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus an INT ``bucket_col`` equal to
    ``ntile(n) OVER (ORDER BY order_cols ASC NULLS FIRST)`` — computed with
    a range shuffle instead of a single-partition global sort.

    ``order_cols`` should end in a unique tie-breaker for a deterministic
    answer (both registered callers do: (ltv, user_id), (zval, event_id)).
    String columns are accepted and sort ASC NULLS FIRST — Spark's window
    default — in both the range partitioner and the in-partition sort.

    Calling this materializes a lazy ``localCheckpoint`` of the ranked
    frame on first action (required for fork consistency — see module
    docstring); the block is freed when the returned DataFrame is GC'd.
    """
    if any(c in df.columns for c in _HELPER_COLS):
        raise ValueError(f"input must not contain helper columns {_HELPER_COLS}")
    if num_partitions is None:
        # track the session's shuffle width at call time; bucket assignment
        # is width-independent (tests assert bit-equality at 1/32/200)
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            num_partitions = _FALLBACK_RANK_PARTITIONS
    ordering = [
        F.col(c).asc_nulls_first() if isinstance(c, str) else c
        for c in order_cols
    ]
    rn = (
        df.repartitionByRange(num_partitions, *ordering)
        .sortWithinPartitions(*ordering)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn(
            "_pid", F.shiftrightunsigned("_mid", _MID_OFFSET_BITS).cast("int")
        )
        .withColumn(
            "_rn",
            F.col("_mid").bitwiseAND(F.lit(_MID_OFFSET_MASK)) + F.lit(1),
        )
        .drop("_mid")
        .localCheckpoint(eager=False)
    )

    counts = rn.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Cumulative offsets + grand total over the P-row counts frame
    # (bounded by construction: P = num_partitions) via a P×P broadcast
    # self-join — NO window functions, so the plan contains zero
    # unpartitioned window sorts, structurally (a literal partition key
    # would be constant-folded back into an empty spec and re-trigger
    # Spark's "No Partition Defined" warning).
    b = counts.select(
        F.col("_pid").alias("_bpid"), F.col("_cnt").alias("_bcnt")
    )
    offsets = (
        counts.join(F.broadcast(b))
        .groupBy("_pid")
        .agg(
            F.sum(
                F.when(F.col("_bpid") < F.col("_pid"), F.col("_bcnt")).otherwise(
                    F.lit(0)
                )
            ).alias("_off"),
            F.sum("_bcnt").alias("_total"),
        )
    )

    ranked = rn.join(F.broadcast(offsets), "_pid")
    # ntile(n) over N rows: the first N%n buckets take ceil(N/n) rows, the
    # rest floor(N/n). Integer-exact: DIV keeps everything in bigint; the
    # global rank is _rn + _off.
    rank = "(_rn + _off)"
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
