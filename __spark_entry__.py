"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 (+ the LLM-data-pipeline extensions:
text stats/quality/SimHash, exact + MinHash-LSH dedup, cosine/hyperplane-LSH/
IVF similarity search, multimodal binary extraction) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each — every registered query is
oracle-checked, none are rows-only. Column names/types are aligned on both
sides; float aggregates go through DECIMAL(18,4) and hashes through
md5-hex→bigint so values are order-independent and bit-identical across
engines (see kafkastreamingetl_spark/functions).

Rotation policy (round 11, replacing the hand-maintained _PRIORITY list)
========================================================================

The driver's CORRECTNESS harness records only the first ~``DRIVER_WINDOW``
(50) entries of ``queries()`` per round, so registration ORDER is part of
the verification contract. Through round 10 the order was a hand-committed
list, re-planned each round — VERDICT r10 flagged that the arithmetic no
longer closes by hand (160 queries / 50 slots = a 3.2-round refresh cycle
against a 4-round staleness policy, retightened by every new query). The
policy is now DERIVED, not transcribed:

* **Order**: never-green queries first (each needs its first driver row),
  then green queries ascending by the round of their latest green driver
  row — oldest-green-first round-robin. Ties break on registration order,
  which is deterministic (module-level dict construction order in
  ``kafkastreamingetl_spark.queries``).
* **Evidence**: the latest green round per query is read from the committed
  ``CORRECTNESS_r*.json`` files next to this module (green = truthy
  ``hash_match``, the same rule the driver-window test has always used).
  The rotation therefore updates itself the moment the driver commits a new
  round's record — no transcription step, nothing to typo (ADVICE r10 #2:
  a misspelled name can no longer silently waste a slot, because the order
  is a permutation of ``queries()`` by construction, test-enforced).
* **Why it closes**: with N registered queries and W = 50 slots per round,
  oldest-first round-robin re-greens every query at most every ceil(N / W)
  rounds. Any 4 consecutive rounds offer 4·W = 200 slots, so the ≤4-round
  staleness bound is satisfiable indefinitely iff N ≤ 200 — enforced as
  ``REGISTRY_CAP`` in ``tests/test_driver_window.py``.

Terminal registry arithmetic (round 13: FROZEN)
===============================================

The registry is frozen at **N = 179** (``REGISTRY_FROZEN_AT`` in
``kafkastreamingetl_spark.queries``; the round-13 cohort spent the final
deliberate slots — quality_classifier_score, batch_contamination_diff,
source_dedup_trend — per VERDICT r12 item 5). The arithmetic that makes
179 terminal: W = 50 driver slots/round × a 4-round staleness bound =
200 evergreen-able queries, ever; at 179, oldest-first rotation re-greens
every query at most every ceil(179/50) = 4 rounds, exactly at the bound,
with 21 slots of slack absorbed by the never-green head in any round that
adds nothing. ``test_registry_is_frozen_at_the_cap`` fails on ANY size
change, so future additions must retire a query and move the marker
deliberately. From here, improvement means evidence depth (floors,
shuffle bytes, scale stress), not query count.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafkastreamingetl_spark.catalog import load_table  # noqa: E402
from kafkastreamingetl_spark.queries import QUERIES, ORACLE_SQL  # noqa: E402
from kafkastreamingetl_spark.operators.rollup import daily_segment_metrics  # noqa: E402

#: slots the driver's CORRECTNESS harness records per round
DRIVER_WINDOW = 50
#: no green row may age past this many rounds without re-verification
MAX_STALENESS_ROUNDS = 4
#: registry size above which the staleness bound is arithmetically
#: unsatisfiable (see module docstring) — test-enforced ceiling
REGISTRY_CAP = DRIVER_WINDOW * MAX_STALENESS_ROUNDS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the daily segment rollup
    (the reference's Airflow batch job X2, re-expressed as one Spark query).
    """
    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return daily_segment_metrics(events, customer)


#: one evidence snapshot per process — ``queries()`` and ``oracle_sql()``
#: both derive their order from it, so a CORRECTNESS file written between
#: the two calls cannot make them disagree (the driver zips them
#: positionally; ADVICE r11).
_LATEST_GREEN_CACHE: dict[str, int] | None = None


def latest_green_rounds() -> dict[str, int]:
    """query name → round of its latest green driver CORRECTNESS row.

    Green = truthy ``hash_match`` (rows+schema+values), the same rule
    ``tests/test_driver_window.py`` has applied since round 9. Unreadable
    or missing files degrade to "no evidence" — a fresh checkout with no
    CORRECTNESS records falls back to pure registration order, which is
    the correct cold-start behavior (everything is never-green).

    The file scan runs once per process; later calls return a copy of the
    cached snapshot so every accessor sees the same evidence.
    """
    global _LATEST_GREEN_CACHE
    if _LATEST_GREEN_CACHE is not None:
        return dict(_LATEST_GREEN_CACHE)
    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    _LATEST_GREEN_CACHE = latest
    return dict(latest)


# Insurance for a standalone copy of this file (no CORRECTNESS records
# adjacent): the must-verify set — never-green queries plus greens at the
# staleness boundary — as computed from the records committed through
# ``_FALLBACK_FROZEN_AT``, in policy order. With the records present (the
# normal case) this list is ignored; without them it reproduces the
# current round's window head instead of degrading to registration order
# (which would strand late-registered queries at the back).
#
# AUTOGENERATED by ``tools/round_start.py`` — do not hand-edit. The test
# suite pins it against the records <= _FALLBACK_FROZEN_AT only, so a new
# driver record never invalidates it mid-round (VERDICT r11 item 1).
# --- fallback-head:begin ---
_FALLBACK_FROZEN_AT = 15
_FALLBACK_HEAD = [
    "value_histogram",
    "daily_counts_unpivot",
    "value_quartiles_by_type",
    "orders_pending_backlog",
    "semantic_eval_contamination",
    "recursive_daily_series",
    "daily_autocorr",
    "events_key_skew_profile",
    "blameless_suppliers",
    "token_posting_lists",
    "source_overlap_matrix",
    "user_rfm_segments",
    "lateral_top_orders",
    "takedown_sweep",
    "doc_length_buckets",
    "source_audit_report",
    "neardup_quality_survivors",
    "eval_ngram_contamination",
    "neardup_candidates_capped",
    "embedding_rp_topk",
    "bm25_topk",
    "gopher_quality_flags",
    "doc_encoding_anomalies",
    "embedding_qc_report",
    "lm_score_bucket_mix",
    "vocab_zipf_slope",
    "doc_dedup_lines",
    "lsh_param_planner",
    "kanon_risk_report",
]
# --- fallback-head:end ---


# Lanes whose OPERATOR CODE was algorithmically restructured in the most
# recent optimization round but whose latest green driver row PREDATES the
# change (VERDICT r15 item 7: green-age rotation alone let restructured
# lanes wait several rounds for ground-truth verification). These sort
# immediately after the never-green tier, ahead of ordinary green-age
# rotation, so the next driver window re-verifies them first. Maintained
# at round close by the optimizer; a name here that is already freshly
# green costs one window slot, never correctness. Current entries: the
# r15 restructures the r15 window missed (substring_run_pairs) plus the
# r16 restructures outside the natural r16 window (mapInPandas
# covariance, shared-feats incremental near-dup, pagerank edge explode,
# one-parse minhash signatures).
_CHANGED_PRIORITY = (
    "substring_run_pairs",
    "embedding_covariance",
    "incremental_neardup_documents",
    "neardup_pagerank",
    "minhash_jaccard_estimate",
    "neardup_pairs_jaccard",
)


def rotation_order(
    names: list[str], latest: dict[str, int] | None = None
) -> list[str]:
    """The policy: never-green first (registration order), then greens on
    the changed-lane priority tier (``_CHANGED_PRIORITY`` — operator code
    restructured more recently than their last green row), then green
    ascending by latest-green round (oldest first), ties on registration
    order. Pure function of (names, committed CORRECTNESS files, the
    committed priority tier) — deterministic, and a permutation of
    ``names`` by construction.
    """
    if latest is None:
        latest = latest_green_rounds()
    if not latest:
        head = [n for n in _FALLBACK_HEAD if n in set(names)]
        return head + [n for n in names if n not in set(head)]
    reg = {n: i for i, n in enumerate(names)}
    changed = set(_CHANGED_PRIORITY)
    return sorted(
        names,
        key=lambda n: (
            latest.get(n, -1) if n not in changed or n not in latest else 0,
            reg[n],
        ),
    )


def _ordered(mapping: dict) -> dict:
    order = rotation_order(list(mapping))
    return {k: mapping[k] for k in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLE_SQL))
