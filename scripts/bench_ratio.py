#!/usr/bin/env python3
"""Compare two bench.py records entry-by-entry: per-query wall ratio
(big/small), sorted worst-first — the quick read on which operators
scale and which carry data-volume-proportional cost.

Usage: python scripts/bench_ratio.py <small.json> <big.json> [top_n]
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    d = json.load(open(path))
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed", d)


def main() -> int:
    small = _load(sys.argv[1])
    big = _load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    ratios = sorted(
        ((qb[k] / qs[k] if qs[k] > 0 else float("inf"), k) for k in common),
        reverse=True,
    )
    n = len(ratios)
    med = sorted(r for r, _ in ratios)[n // 2]
    print(
        f"{n} common entries; data ratio "
        f"{big.get('sf', '?')}/{small.get('sf', '?')}; "
        f"wall {small['value']}s -> {big['value']}s; median ratio {med:.2f}x"
    )
    for r, k in ratios[:top_n]:
        print(f"  {r:7.1f}x  {k}  ({qs[k]}s -> {qb[k]}s)")
    missing = sorted(set(qs) - set(qb))
    if missing:
        print("MISSING in big:", missing)
    if big.get("failures"):
        print("FAILURES:", json.dumps(big["failures"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
