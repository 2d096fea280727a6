"""Shared fixtures: one SparkSession for the whole test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamingetl_spark.session import get_test_spark  # noqa: E402

# Tests default to the smallest sf for iteration speed; the full-suite
# differential at sf0.01 runs via `python -m kafkastreamingetl_spark.oracle`
# (the verify recipe) and at sf0.1 via tests/test_scale_stress.py.
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_test_spark("kafkastreamingetl_spark_tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.getenv("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)
