"""Plan-shape regression net: every registered query's physical operator
counts must match the committed snapshot (PLAN_SHAPES.json).

The snapshot pins the SCALE-relevant plan facts — how many exchanges, which
join strategies, aggregation modes, Generate/Window/TakeOrdered usage — so
an edit that silently turns a broadcast join into a shuffle, adds an
exchange, or drops TakeOrderedAndProject fails a test instead of shipping.
(BroadcastNestedLoopJoin entries in the snapshot are the deliberate
single-broadcast-row model/scalar cross joins — pinned like everything
else, so an accidental O(n·m) nested loop still shows up as a diff.)

Regenerate after intentional plan changes with::

    python -m kafkastreamingetl_spark.plans --shapes-write
"""

from __future__ import annotations

import json
import os

import pytest

from kafkastreamingetl_spark.plans import plan_shape
from kafkastreamingetl_spark.queries import QUERIES

pytestmark = pytest.mark.slow

_SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLAN_SHAPES.json")


def _reset_engine_state(spark) -> None:
    """Return the session to the cold state the snapshot was generated in:
    shared-session test order must not leak persisted feature sets (their
    InMemoryRelation replaces plan subtrees) or resolved-label memos
    (checkpoint scans replace the closure pipeline) into the plans under
    measurement."""
    from kafkastreamingetl_spark.operators import dedup, similarity

    while dedup._FEATS_CACHE:
        _, df = dedup._FEATS_CACHE.popitem()
        df.unpersist()
    dedup._CLUSTERS_CACHE.clear()
    similarity._EMB_CLUSTERS_CACHE.clear()
    similarity._MODEL_CACHE.clear()
    spark.catalog.clearCache()


def test_plan_shapes_match_snapshot(spark, sf_dir):
    _reset_engine_state(spark)
    with open(_SNAPSHOT) as f:
        expected = json.load(f)
    missing = sorted(set(QUERIES) - set(expected))
    assert not missing, f"queries without a snapshot (run --shapes-write): {missing}"
    diffs = {}
    for name, fn in QUERIES.items():
        got = plan_shape(fn(spark, sf_dir))
        if got != expected[name]:
            diffs[name] = {"expected": expected[name], "got": got}
    assert not diffs, json.dumps(diffs, indent=1, sort_keys=True)
