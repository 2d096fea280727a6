"""The driver's CORRECTNESS harness records roughly the first 50 entries of
``queries()`` per round, so registration order is part of the verification
contract. Since round 11 the order is DERIVED from the committed
CORRECTNESS records (never-green first, then oldest-green-first — see the
``__spark_entry__`` module docstring for the policy and its closing
arithmetic) instead of hand-transcribed; these tests enforce the policy's
three load-bearing properties:

1. the emitted order IS the policy (permutation + exact sort key);
2. every query that MUST be in this round's window (never-green, or green
   row at the staleness boundary) actually is — i.e. demand fits capacity;
3. the registry stays small enough that the staleness bound is satisfiable
   indefinitely (N ≤ 4 × 50 slots = 200 — at that cap, oldest-first
   round-robin re-greens every query within 4 rounds forever).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from __spark_entry__ import (  # noqa: E402
    DRIVER_WINDOW,
    MAX_STALENESS_ROUNDS,
    REGISTRY_CAP,
    latest_green_rounds,
    queries,
    oracle_sql,
    rotation_order,
)


def _independent_latest_green() -> tuple[dict[str, int], int]:
    """Recompute latest-green per query straight from the files (not via the
    module under test) and return it with the current round number (= newest
    committed CORRECTNESS round + 1)."""
    latest: dict[str, int] = {}
    newest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("hash_match"):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest, newest + 1


def test_order_is_exactly_the_policy():
    import __spark_entry__ as e

    names = list(queries())
    latest, _ = _independent_latest_green()
    reg_names = list(queries.__globals__["QUERIES"])
    reg = {n: i for i, n in enumerate(reg_names)}
    changed = set(e._CHANGED_PRIORITY)

    def key(n):
        eff = latest.get(n, -1)
        if n in changed and n in latest:
            eff = 0  # changed-lane tier: after never-green, before greens
        return (eff, reg[n])

    expected = sorted(names, key=key)
    assert names == expected
    # module's own evidence reader agrees with the independent one
    assert latest_green_rounds() == latest
    assert rotation_order(reg_names) == expected
    # queries() and oracle_sql() emit the SAME order (the driver zips them)
    assert list(oracle_sql()) == names
    # permutation of the registry: nothing dropped, nothing invented
    # (ADVICE r10 #2 — the failure mode of the old hand list)
    assert sorted(names) == sorted(reg_names)
    assert len(set(names)) == len(names)


def test_window_demand_fits_capacity():
    """Everything that MUST be verified this round sits inside the window:
    never-green queries (need a first row) and queries whose green row is at
    the staleness boundary (age >= MAX_STALENESS_ROUNDS this round). If this
    ever fails, the registry grew faster than the window can re-verify —
    remove/merge queries or widen the policy, but DECIDE, don't drift."""
    names = list(queries())
    latest, current_round = _independent_latest_green()
    window = set(names[:DRIVER_WINDOW])
    must = [
        n
        for n in names
        if n not in latest
        or current_round - latest[n] >= MAX_STALENESS_ROUNDS
    ]
    assert len(must) <= DRIVER_WINDOW, (
        f"{len(must)} queries need a driver row this round but only "
        f"{DRIVER_WINDOW} slots exist: {must}"
    )
    outside = [n for n in must if n not in window]
    assert not outside, (
        f"queries that must re-verify this round sit outside the "
        f"{DRIVER_WINDOW}-slot window: {outside}"
    )


def test_registry_within_sustainable_cap():
    """ceil(N / window) <= max staleness, i.e. N <= 200: the arithmetic
    under which oldest-first rotation keeps every green row fresh forever.
    Every registration beyond the cap would make the staleness policy
    unsatisfiable no matter the ordering."""
    n = len(queries())
    assert n <= REGISTRY_CAP, (
        f"{n} registered queries > sustainable cap {REGISTRY_CAP} "
        f"(= {DRIVER_WINDOW} slots x {MAX_STALENESS_ROUNDS}-round bound)"
    )


def test_fallback_order_without_records_still_leads_with_never_greens():
    """A standalone copy of __spark_entry__.py (no adjacent CORRECTNESS
    files) must not strand the must-verify queries at their registration
    positions: with empty evidence the rotation leads with the committed
    fallback head, which is still a permutation of the registry.

    The head is validated ONLY against records <= _FALLBACK_FROZEN_AT (the
    round it was generated from, by tools/round_start.py) — a newer driver
    record greening those names must NOT break this test (VERDICT r11
    item 1: the r11 version pinned the head against LIVE evidence and
    deterministically broke the moment CORRECTNESS_r11.json landed)."""
    import __spark_entry__ as e

    reg_names = list(queries.__globals__["QUERIES"])
    order = rotation_order(reg_names, latest={})
    assert order[: len(e._FALLBACK_HEAD)] == e._FALLBACK_HEAD
    assert sorted(order) == sorted(reg_names)
    # the head equals the must-verify set in policy order, computed from
    # the evidence as of the frozen round only
    frozen = e._FALLBACK_FROZEN_AT
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) > frozen:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("hash_match"):
                    latest[name] = max(latest.get(name, 0), rnd)
    current_round = frozen + 1
    frozen_order = rotation_order(reg_names, latest=latest)
    must = [
        n
        for n in frozen_order
        if n not in latest
        or current_round - latest[n] >= MAX_STALENESS_ROUNDS
    ]
    assert e._FALLBACK_HEAD == must, (
        "fallback head is stale relative to its own frozen round — "
        "rerun python tools/round_start.py"
    )


def test_fallback_head_survives_future_driver_records(tmp_path):
    """Forward-compat (VERDICT r11 item 1 'done' criterion): simulate the
    driver committing a NEXT-round record that greens every fallback name.
    The frozen head must stay valid (it is pinned to records <= its frozen
    round), and the live rotation must simply move those names to the back
    — no test in the suite may depend on evidence newer than the freeze."""
    import __spark_entry__ as e

    reg_names = list(queries.__globals__["QUERIES"])
    latest, current_round = _independent_latest_green()
    # synthetic r(current) record: everything green this round
    future = dict(latest)
    for n in reg_names:
        future[n] = current_round
    order = rotation_order(reg_names, latest=future)
    # policy invariants hold under the synthetic evidence
    assert sorted(order) == sorted(reg_names)
    reg = {n: i for i, n in enumerate(reg_names)}
    changed = set(e._CHANGED_PRIORITY)
    keys = [
        (0 if n in changed and n in future else future.get(n, -1), reg[n])
        for n in order
    ]
    assert keys == sorted(keys)
    # and the frozen fallback constants are untouched by evidence drift:
    # they are plain committed data, not recomputed from live records
    assert isinstance(e._FALLBACK_FROZEN_AT, int)
    assert all(n in set(reg_names) for n in e._FALLBACK_HEAD)


def test_rotation_policy_properties_hold_for_any_evidence():
    """Property test over random latest-green evidence: the policy always
    emits a permutation, never-green names always precede every green
    name, and green names are ordered by ascending latest-green round
    with registration order breaking ties."""
    from hypothesis import given, settings, strategies as st

    reg_names = list(queries.__globals__["QUERIES"])
    reg = {n: i for i, n in enumerate(reg_names)}

    import __spark_entry__ as e

    changed = set(e._CHANGED_PRIORITY)

    @settings(max_examples=50, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(reg_names),
            st.integers(min_value=1, max_value=30),
            max_size=len(reg_names),
        )
    )
    def prop(latest):
        order = rotation_order(reg_names, latest=latest) if latest else None
        if order is None:
            return  # empty evidence exercises the fallback path, tested above
        assert sorted(order) == sorted(reg_names)
        keys = [
            (
                0
                if n in changed and n in latest
                else latest.get(n, -1),
                reg[n],
            )
            for n in order
        ]
        assert keys == sorted(keys)
        greens = [i for i, n in enumerate(order) if n in latest]
        nevers = [i for i, n in enumerate(order) if n not in latest]
        assert not nevers or not greens or max(nevers) < min(greens)

    prop()


def test_registry_is_frozen_at_the_cap():
    """Round 13 spent the final deliberate slots (VERDICT r12 item 5) and
    froze the registry: the committed marker must equal the live count,
    so ANY future registration fails here and forces an explicit decision
    to retire something instead — growth is no longer free, because every
    query past REGISTRY_CAP would age some green row past the staleness
    bound regardless of rotation order."""
    from kafkastreamingetl_spark.queries import (
        QUERIES,
        REGISTRY_CAP,
        REGISTRY_FROZEN_AT,
    )

    assert len(QUERIES) == REGISTRY_FROZEN_AT, (
        f"registry changed size ({len(QUERIES)} != frozen "
        f"{REGISTRY_FROZEN_AT}): the registry is FROZEN — retire a query "
        "for every addition and update REGISTRY_FROZEN_AT deliberately"
    )
    assert REGISTRY_FROZEN_AT <= REGISTRY_CAP
