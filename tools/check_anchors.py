"""Anchor-drift checker for COVERAGE.md (VERDICT r10 what's-wrong #1).

COVERAGE.md cites implementations as ``file.py:LINE`` anchors, usually with
the symbol named beside them (`` `catalog.py:201` (`dim_from_rows`) ``). As
files grow, the line numbers silently drift off the symbols they point at.
This tool re-derives every anchor's truth from the AST:

* for each markdown table cell containing ``<file>.py:<lines>`` anchors,
  collect the backticked identifiers cited in the SAME cell;
* every cited line must fall inside the span (def line .. end of block) of
  one of those identifiers' definitions in the resolved file — or, when the
  cell names no identifier, inside ANY top-level def/class (so the anchor
  at least points at real code);
* drifted anchors are reported with the named symbols' true def lines.

Run: ``python tools/check_anchors.py`` (exit 1 on drift). The pytest
wrapper ``tests/test_coverage_anchors.py`` keeps it honest per-commit.
"""

from __future__ import annotations

import ast
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "COVERAGE.md")

ANCHOR = re.compile(r"`([\w/]+\.py):(\d+(?:,\d+)*)`")
TICKED = re.compile(r"`([A-Za-z_][\w.]*)`")


def _resolve(path_frag: str) -> str | None:
    """Map a cited fragment (``catalog.py``, ``operators/dedup.py``) to the
    unique matching source file outside tests/."""
    hits = [
        p
        for p in glob.glob(os.path.join(REPO, "**", "*.py"), recursive=True)
        if os.sep + "tests" + os.sep not in p
        and os.sep + "spark-warehouse" + os.sep not in p
        and p.replace(os.sep, "/").endswith("/" + path_frag)
    ]
    if len(hits) == 1:
        return hits[0]
    # prefer the package over repo-root shims when ambiguous
    pkg = [h for h in hits if "kafkastreamingetl_spark" in h]
    return pkg[0] if len(pkg) == 1 else None


def _spans(pyfile: str) -> dict[str, list[tuple[int, int]]]:
    """symbol name → [(def line, end line)] for every def/class, any depth."""
    with open(pyfile) as f:
        tree = ast.parse(f.read())
    out: dict[str, list[tuple[int, int]]] = {}
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            out.setdefault(node.name, []).append(
                (node.lineno, node.end_lineno or node.lineno)
            )
    return out


def check() -> list[str]:
    problems: list[str] = []
    with open(DOC) as f:
        lines = f.readlines()
    for lineno, line in enumerate(lines, 1):
        # table rows only; a cell is one |-delimited field
        for cell in line.split("|"):
            anchors = ANCHOR.findall(cell)
            if not anchors:
                continue
            cited = {
                t.split(".")[-1]
                for t in TICKED.findall(cell)
                if not t.endswith(".py") and ":" not in t
            }
            for frag, nums in anchors:
                pyfile = _resolve(frag)
                if pyfile is None:
                    problems.append(
                        f"COVERAGE.md:{lineno}: cannot resolve `{frag}`"
                    )
                    continue
                spans = _spans(pyfile)
                known = {
                    s: spans[s] for s in cited if s in spans
                } or spans  # no symbol cited in-cell -> any def/class
                for n in map(int, nums.split(",")):
                    if any(
                        lo <= n <= hi
                        for spanlist in known.values()
                        for lo, hi in spanlist
                    ):
                        continue
                    truth = {
                        s: [lo for lo, _ in spans[s]]
                        for s in cited
                        if s in spans
                    }
                    problems.append(
                        f"COVERAGE.md:{lineno}: `{frag}:{n}` is outside "
                        f"every cited symbol's span; cited symbols define "
                        f"at {truth or '(none found in file)'}"
                    )
    return problems


if __name__ == "__main__":
    probs = check()
    for p in probs:
        print(p)
    print(f"{len(probs)} drifted anchor(s)")
    sys.exit(1 if probs else 0)
