"""The driver's CORRECTNESS harness records roughly the first 50 entries of
``queries()`` per round, so registration order is part of the verification
contract: every query that has never earned a green driver row must sit
inside that window, or it can never earn one.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def test_never_green_queries_sit_inside_driver_window():
    import sys

    sys.path.insert(0, REPO)
    from __spark_entry__ import queries

    names = list(queries())
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match"):
                    green.add(name)
    never_green = [n for n in names if n not in green]
    outside = [n for n in never_green if n not in set(names[:DRIVER_WINDOW])]
    # Demand can exceed the 50-slot window in a round that both fixes
    # prior failures and adds new operators; same-round additions are the
    # ones that wait (they rotate in next round). That deferral must be a
    # DECISION, not an accident: any never-green query outside the window
    # has to be on this explicit list. Round 10: the window heads with the
    # thirteen round-9 never-greens and fills with 37 of the 43 r6-greens;
    # round-10 additions (locally differential-green) wait for round 11,
    # whose window MUST lead with the six age-4 r6 stragglers
    # (rolling_hour_value, doc_pack_bins, user_running_totals,
    # corpus_shuffle_shards, embedding_quantize_int8, props_variant_extract)
    # and then these never-greens.
    deferred_this_round: set[str] = {
        "ann_recall_report",
        "lsh_band_load_profile",
        "incremental_neardup_documents",
        "neardup_pagerank",
        "user_interarrival_stats",
        "doc_char_entropy",
        "bigram_pmi_collocations",
    }
    unexpected = [n for n in outside if n not in deferred_this_round]
    assert not unexpected, (
        f"queries with no green driver row outside the first "
        f"{DRIVER_WINDOW} registrations (and not deliberately deferred): "
        f"{unexpected}"
    )
