"""Diff two bench JSON files and flag per-query regressions.

Usage: python scripts/bench_diff.py BENCH_r03.json BENCH_r04.json [threshold]

Prints one line per query with old/new seconds and the ratio; queries
slower than ``threshold``x (default 1.5) are marked REGRESSED, new
queries NEW, and removed ones GONE. Exit code 0 always — this is a
reporting tool; judgment (noise band vs real regression, see
PLANS.md's cosine-topk postmortem) stays with the reader.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    def load(path):
        d = json.load(open(path))
        # the driver wraps bench output as {"parsed": {...}, "tail": ...}
        return d.get("parsed", d) or {}

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old.get("queries", {}), new.get("queries", {})

    print(f"suite: {old.get('value')}s -> {new.get('value')}s")
    for name in sorted(set(oq) | set(nq)):
        if name not in nq:
            print(f"GONE       {name:35s} {oq[name]:>8.3f}s -> -")
        elif name not in oq:
            print(f"NEW        {name:35s}        - -> {nq[name]:>8.3f}s")
        else:
            ratio = nq[name] / oq[name] if oq[name] else float("inf")
            tag = "REGRESSED" if ratio > threshold else ("improved" if ratio < 1 / threshold else "         ")
            print(f"{tag:10s} {name:35s} {oq[name]:>8.3f}s -> {nq[name]:>8.3f}s  ({ratio:.2f}x)")
    if "scaling" in new:
        print(f"scaling mean_time_ratio: {new['scaling'].get('mean_time_ratio')}x at {new['scaling'].get('copies')}x rows")


if __name__ == "__main__":
    main()
