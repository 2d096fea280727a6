"""blameless_suppliers: the aggregation-decorrelated DataFrame lane must
equal Spark's OWN execution of the correlated EXISTS/NOT-EXISTS form — a
within-engine differential, independent of the DuckDB oracle."""

from __future__ import annotations

import pytest

from kafkastreamingetl_spark.queries import blameless_suppliers_frames

_EXISTS_SQL = """
WITH l1 AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM {li}
    WHERE l_suppkey IS NOT NULL
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_clean_orders
FROM l1
JOIN {sup} s ON s.s_suppkey = l1.l_suppkey
WHERE NOT EXISTS (
    SELECT 1 FROM {li} l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey = l1.l_suppkey
      AND l2.l_returnflag = 'R'
)
AND EXISTS (
    SELECT 1 FROM {li} l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey IS NOT NULL
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
)
GROUP BY s.s_name
"""


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_orderkey bigint, l_suppkey bigint, l_returnflag string"
    )


def _sup(spark, keys):
    return spark.createDataFrame(
        [(k, f"Supplier#{k:03d}") for k in keys],
        "s_suppkey bigint, s_name string",
    )


def test_hand_built_credit_assignment(spark):
    rows = [
        # order 1: S1 clean, S2 returned -> S1 credited
        (1, 1, "N"),
        (1, 2, "R"),
        # order 2: only S1, returned -> nobody credited
        (2, 1, "R"),
        # order 3: S1 clean, S3 clean, no returns -> nobody credited
        (3, 1, "N"),
        (3, 3, "N"),
        # order 4: S3 has BOTH a clean and a returned line -> S3 is NOT
        # blameless on 4; S1 clean -> S1 credited
        (4, 1, "N"),
        (4, 3, "R"),
        (4, 3, "N"),
        # null suppkey returned line never counts as "another supplier"
        (5, 1, "N"),
        (5, None, "R"),
    ]
    got = {
        (r.s_name, r.n_clean_orders)
        for r in blameless_suppliers_frames(
            _li(spark, rows), _sup(spark, [1, 2, 3])
        ).collect()
    }
    assert got == {("Supplier#001", 2)}


@pytest.mark.parametrize("seed", [7, 21])
def test_decorrelated_lane_equals_spark_exists_execution(spark, seed):
    import random

    rng = random.Random(seed)
    rows = []
    for ok in range(1, 120):
        for _ in range(rng.randint(1, 4)):
            sk = rng.choice([None] + list(range(1, 12)))
            rows.append((ok, sk, rng.choice(["N", "R", "A", None])))
    li = _li(spark, rows)
    sup = _sup(spark, range(1, 12))
    li.createOrReplaceTempView("t_decor_li")
    sup.createOrReplaceTempView("t_decor_sup")
    expected = spark.sql(
        _EXISTS_SQL.format(li="t_decor_li", sup="t_decor_sup")
    )
    got = blameless_suppliers_frames(li, sup, limit=None).select(
        "s_name", "n_clean_orders"
    )
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0
