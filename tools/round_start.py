"""Round-start regeneration of the round-pinned artifacts (VERDICT r11
item 4): run once at the top of every round, after the driver has
committed the previous round's CORRECTNESS record.

1. ``_FALLBACK_HEAD`` / ``_FALLBACK_FROZEN_AT`` in ``__spark_entry__.py``
   — the insurance rotation head for a standalone copy of that file.
   Recomputed as the must-verify set (never-green + greens at the
   staleness boundary) from the freshest committed records, in policy
   order, and pinned to the newest record round so later driver records
   cannot invalidate it (the failure mode of the round-11 hand-frozen
   list, VERDICT r11 item 1).
2. ``QUERY_INDEX.md`` — delegates to ``tools/gen_query_index.py``.

    python tools/round_start.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOCK_RE = re.compile(
    r"# --- fallback-head:begin ---\n.*?# --- fallback-head:end ---",
    re.DOTALL,
)


def regenerate_fallback_head() -> list[str]:
    import __spark_entry__ as entry
    from kafkastreamingetl_spark.queries import QUERIES

    latest = entry.latest_green_rounds()
    if not latest:
        raise SystemExit("no CORRECTNESS records found — nothing to freeze")
    newest = max(latest.values())
    current_round = newest + 1
    names = list(QUERIES)
    order = entry.rotation_order(names, latest=latest)
    must = [
        n
        for n in order
        if n not in latest
        or current_round - latest[n] >= entry.MAX_STALENESS_ROUNDS
    ]

    path = os.path.join(REPO, "__spark_entry__.py")
    with open(path) as f:
        src = f.read()
    head_lines = "\n".join(f'    "{n}",' for n in must)
    block = (
        "# --- fallback-head:begin ---\n"
        f"_FALLBACK_FROZEN_AT = {newest}\n"
        "_FALLBACK_HEAD = [\n"
        f"{head_lines}\n"
        "]\n"
        "# --- fallback-head:end ---"
    )
    new_src, n_sub = BLOCK_RE.subn(block, src)
    if n_sub != 1:
        raise SystemExit("fallback-head markers not found in __spark_entry__.py")
    if new_src != src:
        with open(path, "w") as f:
            f.write(new_src)
    print(
        f"_FALLBACK_HEAD frozen at r{newest}: {len(must)} must-verify names "
        f"({', '.join(must[:4])}{', ...' if len(must) > 4 else ''})"
    )
    return must


_BENCH_EVIDENCE = ("BENCH_DETAIL.json", "BENCH_MEDIAN.json")


def restore_bench_evidence() -> list[str]:
    """Make a stray rewrite of the committed bench evidence a non-event
    (VERDICT r14 what's-wrong #1): if the working tree's BENCH_DETAIL.json
    / BENCH_MEDIAN.json differ from HEAD (e.g. a pre-r15 tree's bench run
    wrote the default path), archive the stray capture to /tmp and restore
    the committed version, so the next ``git add -A`` cannot replace
    median evidence with a single run. Since r15 bench.py defaults to the
    gitignored BENCH_DETAIL_LAST_RUN.json, so this is pure insurance."""
    import shutil
    import subprocess
    import tempfile

    restored = []
    for name in _BENCH_EVIDENCE:
        path = os.path.join(REPO, name)
        diff = subprocess.run(
            ["git", "diff", "--quiet", "HEAD", "--", name], cwd=REPO
        )
        if diff.returncode == 0:
            continue
        archive_dir = tempfile.mkdtemp(prefix="round_start_bench_capture_")
        shutil.copy2(path, os.path.join(archive_dir, name))
        subprocess.run(
            ["git", "checkout", "--", name], cwd=REPO, check=True
        )
        restored.append(name)
        print(
            f"restored committed {name} (stray capture archived at "
            f"{archive_dir}/{name})"
        )
    return restored


def main() -> int:
    restore_bench_evidence()
    regenerate_fallback_head()
    # QUERY_INDEX.md reflects the same evidence snapshot
    import gen_query_index

    gen_query_index.main()
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
