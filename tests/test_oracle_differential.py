"""Differential correctness: every registered query vs its DuckDB oracle.

The local twin of the driver's correctness gate (SURVEY.md §5 strategy 1):
rows + schema + order-insensitive exact values must match at sf0.001.
"""

from __future__ import annotations

import pytest

from kafkastreamingetl_spark.oracle import run_compare
from kafkastreamingetl_spark.queries import ORACLE_SQL, QUERIES


def test_every_query_has_an_oracle():
    # rows-only entries are allowed by the driver but must be deliberate;
    # today every query is oracle-checked.
    assert set(ORACLE_SQL) == set(QUERIES)


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    return {r.name: r for r in run_compare(spark, sf_dir)}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(results, name):
    res = results[name]
    assert res.ok, str(res)
