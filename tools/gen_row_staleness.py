"""Correctness-row staleness audit: for every registry query, find the
latest CORRECTNESS_r{N} round that recorded a green row, and the last
round whose commits touched the query's implementing function (via
``git log -L`` over the function's line span). A row is STALE when the
function changed after the round that produced the row — the row is
then evidence about old code, not the current tree.

    python tools/gen_row_staleness.py            # table to stdout

Round attribution: commits are bucketed by the "round N:" driver
commits in history (a commit belongs to round N if it is an ancestor
of round N's marker and not of round N-1's).
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PLAN_FILES = sorted(glob.glob(os.path.join(REPO, "nabatshy_spark/plans/*.py")))


def _query_functions() -> dict[str, tuple[str, int, int]]:
    """query name -> (file, first line, last line) of the registering
    function (the ``@query("name")`` decorator's def)."""
    out: dict[str, tuple[str, int, int]] = {}
    for path in PLAN_FILES:
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id == "query"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    name = dec.args[0].value
                    out[name] = (path, node.lineno, node.end_lineno)
    return out


def _row_rounds() -> dict[str, int]:
    """query name -> latest round with a CORRECTNESS row."""
    rows: dict[str, int] = {}
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        try:
            data = json.load(open(p))
        except (OSError, json.JSONDecodeError):
            continue
        for k in data:
            rows[k] = max(rows.get(k, 0), n)
    return rows


def _round_markers() -> list[tuple[int, str]]:
    """(round, commit) for each driver 'round N:' commit, ascending."""
    log = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %s"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    marks = []
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+):", subj)
        if m:
            marks.append((int(m.group(1)), sha))
    return sorted(marks)


def _last_touch_commit(path: str, lo: int, hi: int) -> str | None:
    r = subprocess.run(
        [
            "git", "-C", REPO, "log", "-1", "--format=%H",
            "-L", f"{lo},{hi}:{os.path.relpath(path, REPO)}",
        ],
        capture_output=True,
        text=True,
    )
    out = r.stdout.strip().splitlines()
    return out[0] if out else None


def _commit_round(sha: str, marks: list[tuple[int, str]]) -> int:
    """Smallest round whose marker commit contains ``sha``; commits
    after the last marker belong to the (current) next round."""
    for n, mark in marks:
        anc = subprocess.run(
            ["git", "-C", REPO, "merge-base", "--is-ancestor", sha, mark],
            capture_output=True,
        )
        if anc.returncode == 0:
            return n
    return marks[-1][0] + 1 if marks else 0


def main() -> None:
    funcs = _query_functions()
    rows = _row_rounds()
    marks = _round_markers()
    stale = []
    fresh = 0
    for name, (path, lo, hi) in sorted(funcs.items()):
        row_round = rows.get(name)
        if row_round is None:
            continue  # never checked — the rotation window handles it
        sha = _last_touch_commit(path, lo, hi)
        if sha is None:
            continue
        touch_round = _commit_round(sha, marks)
        # A row from round N certifies code as of round N's marker;
        # the function is stale iff it changed in a LATER round.
        if touch_round > row_round:
            stale.append((name, row_round, touch_round, os.path.relpath(path, REPO)))
        else:
            fresh += 1
    print(f"checked {fresh + len(stale)} row-backed queries: "
          f"{fresh} fresh, {len(stale)} stale")
    if stale:
        print("| query | row round | last touched | file |")
        print("|---|---|---|---|")
        for name, rr, tr, path in stale:
            print(f"| `{name}` | r{rr} | r{tr} | {path} |")


if __name__ == "__main__":
    main()
