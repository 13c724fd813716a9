#!/usr/bin/env python
"""Min-merge per-query floors across bench invocations (r6 protocol —
same as r5: steal noise is strictly one-sided, so per-query minima over
many runs are valid floors).

Usage: python BENCH/merge_floors.py out.json run1.json run2.json ...
Each run file is one bench.py JSON line. Prints a comparison against
BENCH/bench_r5_final.json.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *runs = sys.argv[1:]
    floors: dict[str, float] = {}
    n_used = 0
    for path in runs:
        try:
            with open(path) as f:
                d = json.load(f)
        except Exception:
            continue
        n_used += 1
        for k, v in d["queries"].items():
            if k not in floors or v < floors[k]:
                floors[k] = v
    total = round(sum(floors.values()), 3)
    result = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": floors,
        "sf": "0.1",
        "source_runs": n_used,
        "note": (
            "per-query min over bench.py invocations at sf0.1 local[32] on "
            "round-6 code; steal noise is one-sided so per-query minima are "
            "valid floors (same protocol as r5)"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    with open("BENCH/bench_r5_final.json") as f:
        r5 = json.load(f)["queries"]
    common = sorted(set(floors) & set(r5))
    print(f"{'query':32s} {'r6':>8s} {'r5':>8s} {'ratio':>6s}")
    for k in sorted(common, key=lambda k: floors[k] / r5[k]):
        print(f"{k:32s} {floors[k]:8.3f} {r5[k]:8.3f} {floors[k]/r5[k]:6.2f}")
    s6 = sum(floors[k] for k in common)
    s5 = sum(r5[k] for k in common)
    print(f"\ncommon-entry floor sum: r6 {s6:.2f}s vs r5 {s5:.2f}s ({s6/s5:.3f}x), runs={n_used}")


if __name__ == "__main__":
    main()
