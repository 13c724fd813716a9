#!/usr/bin/env python
"""Scaling-evidence harness: same job, same input, N vs 4N cores.

Sandbox substitute for the north rule's two-cluster-size criterion (see
BASELINE.md "Scaling-evidence protocol"): run the identical pipeline at
``local[N]`` and ``local[4N]`` in separate JVMs, report throughput at both,
scaling efficiency = (thr_4N / thr_N) / 4, and assert the rolled-up tier
checksums are IDENTICAL across parallelism levels.

Writes BENCH/BASELINE.md. Usage: python BENCH/scaling.py [N] (default 8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_scale_worker.py")


def run(cores: int, n_urls: int, samples: int) -> dict:
    out = subprocess.run(
        [sys.executable, WORKER, str(cores), str(n_urls), str(samples)],
        capture_output=True,
        text=True,
        timeout=1800,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_urls = int(os.environ.get("SCALE_URLS", "1500"))
    samples = int(os.environ.get("SCALE_SAMPLES", "400"))

    r_n = run(n, n_urls, samples)
    r_4n = run(4 * n, n_urls, samples)

    same = r_n["tier_checksums"] == r_4n["tier_checksums"] and r_n["tier_counts"] == r_4n["tier_counts"]
    eff = (r_4n["throughput_pts_per_sec"] / r_n["throughput_pts_per_sec"]) / 4

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    lines = [
        "# BENCH/BASELINE — scaling evidence (N vs 4N cores)",
        "",
        f"Generated {stamp} by `python BENCH/scaling.py {n}`. Identical job",
        f"(pages→correct→1m/1h/1d rollup→Gorilla compress) on identical input",
        f"({n_urls} urls × {samples} samples → {r_n['corrected_points']:,} corrected points),",
        "fresh JVM per level, input materialized before the timed window.",
        "",
        "| metric | " + f"local[{n}] | local[{4*n}] |",
        "|---|---|---|",
        f"| correct kernel sec | {r_n['sec_correct']} | {r_4n['sec_correct']} |",
        f"| rollup tiers sec | {r_n['sec_rollup']} | {r_4n['sec_rollup']} |",
        f"| compress sec | {r_n['sec_compress']} | {r_4n['sec_compress']} |",
        f"| total work sec | {r_n['work_sec']} | {r_4n['work_sec']} |",
        f"| throughput (corrected points/sec) | {r_n['throughput_pts_per_sec']:,} | {r_4n['throughput_pts_per_sec']:,} |",
        f"| rolled-up points (1m+1h+1d) | {r_n['rolled_points_total']:,} | {r_4n['rolled_points_total']:,} |",
        f"| compressed bytes/point (1m) | {r_n['bytes_per_point_1m']} | {r_4n['bytes_per_point_1m']} |",
        "",
        f"**Scaling efficiency (N→4N): {eff:.3f}** (target ≥ 0.8)",
        "",
        f"**Result identity across parallelism:** tier row counts and rounded",
        f"value checksums {'IDENTICAL ✓' if same else 'DIFFER ✗'} at both levels.",
        "",
        "Raw worker JSON:",
        "```json",
        json.dumps(r_n),
        json.dumps(r_4n),
        "```",
    ]
    path = os.path.join(HERE, "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": round(eff, 3), "identical": same, "report": path}))


if __name__ == "__main__":
    main()
