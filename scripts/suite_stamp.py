#!/usr/bin/env python3
"""Run the full pytest suite and write PYTEST_r<N>.json as a tracked
artifact (round-12 verdict item 5: two consecutive rounds promised an
end-of-round suite run in NOTES that never landed — the stamp makes
the evidence a file, not a promise).

The record carries pass/fail/skip counts, wall seconds, the git SHA
the suite ran against, and whether the working tree was dirty at run
time (a dirty-tree stamp proves less: the committed SHA may not be
what was tested).

Usage: python scripts/suite_stamp.py <round> [pytest args...]
Writes PYTEST_r<N>.json at the repo root and exits with pytest's
return code (so CI-style callers still fail on a red suite).
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    extra = sys.argv[2:]

    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.strip()
    )

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *extra],
        cwd=REPO, capture_output=True, text=True,
    )
    wall = round(time.time() - t0, 1)
    tail = (proc.stdout or "").strip().splitlines()[-1] if proc.stdout else ""

    counts = {}
    for n, what in re.findall(r"(\d+) (passed|failed|skipped|error[s]?)", tail):
        counts[what.rstrip("s") if what.startswith("error") else what] = int(n)

    rec = {
        "round": rnd,
        "git_sha": sha,
        "working_tree_dirty": dirty,
        "wall_s": wall,
        "returncode": proc.returncode,
        "passed": counts.get("passed", 0),
        "failed": counts.get("failed", 0),
        "skipped": counts.get("skipped", 0),
        "errors": counts.get("error", 0),
        "summary_line": tail[:300],
    }
    out = os.path.join(REPO, f"PYTEST_r{rnd:02d}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
