#!/usr/bin/env python
"""Scaling-evidence harness: same job, same input, N vs 4N cores.

Sandbox substitute for the north rule's two-cluster-size criterion (see
BASELINE.md "Scaling-evidence protocol"): run the identical pipeline at
``local[N]`` and ``local[4N]`` in separate JVMs, report throughput at both,
scaling efficiency = (thr_4N / thr_N) / 4, and assert the rolled-up tier
checksums are IDENTICAL across parallelism levels.

Default N=2 (→ 4N=8): this VM exposes 32 hardware threads on 16 physical
cores, and a pure-CPU multiprocessing probe scales only ~2.8×/4 from 8→32
workers (SMT sharing), so 8→32 cannot evidence ≥0.8 no matter how good the
job is. 2→8 stays within physical cores. The probe itself is recorded in
the report for transparency.

Writes BENCH/BASELINE.md. Usage: python BENCH/scaling.py [N] (default 2).
IMPORTANT: run alone — concurrent load on the box corrupts the measurement.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_scale_worker.py")


def run(cores: int, n_urls: int, samples: int) -> dict:
    out = subprocess.run(
        [sys.executable, WORKER, str(cores), str(n_urls), str(samples)],
        capture_output=True,
        text=True,
        timeout=2400,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn(_):
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 1.0:
        x += 1
    return x


def cpu_probe(n: int) -> dict:
    """Pure-CPU hardware-scaling probe at N and 4N processes."""
    out = {}
    for procs in (n, 4 * n):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            total = sum(p.map(_burn, range(procs)))
            wall = time.perf_counter() - t0
        out[procs] = total / wall
    out["hw_efficiency"] = round((out[4 * n] / out[n]) / 4, 3)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_urls = int(os.environ.get("SCALE_URLS", "4000"))
    samples = int(os.environ.get("SCALE_SAMPLES", "600"))

    hw = cpu_probe(n)
    r_n = run(n, n_urls, samples)
    r_4n = run(4 * n, n_urls, samples)

    same = (
        r_n["tier_checksums"] == r_4n["tier_checksums"]
        and r_n["tier_counts"] == r_4n["tier_counts"]
    )
    eff = (r_4n["throughput_pts_per_sec"] / r_n["throughput_pts_per_sec"]) / 4

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    lines = [
        "# BENCH/BASELINE — scaling evidence (N vs 4N cores)",
        "",
        f"Generated {stamp} by `python BENCH/scaling.py {n}`. Identical job",
        "(pages→correct→1m rollup→parquet, cascade 1h/1d, Gorilla compress)",
        f"on identical input ({n_urls} urls × {samples} samples → "
        f"{r_n['corrected_points']:,} corrected points), fresh JVM per level,",
        f"input materialized and Python workers warmed before the timed window,",
        f"best of {r_n['reps']} reps per level (filters VM noise).",
        "",
        f"| metric | local[{n}] | local[{4*n}] |",
        "|---|---|---|",
        f"| correct + 1m tier sec | {r_n['sec_correct_1m']} | {r_4n['sec_correct_1m']} |",
        f"| 1h/1d cascades sec | {r_n['sec_cascades']} | {r_4n['sec_cascades']} |",
        f"| compress sec | {r_n['sec_compress']} | {r_4n['sec_compress']} |",
        f"| total work sec | {r_n['work_sec']} | {r_4n['work_sec']} |",
        f"| throughput (corrected points/sec) | {r_n['throughput_pts_per_sec']:,} | {r_4n['throughput_pts_per_sec']:,} |",
        f"| rolled-up points (1m+1h+1d) | {r_n['rolled_points_total']:,} | {r_4n['rolled_points_total']:,} |",
        f"| compressed bytes/point (1m) | {r_n['bytes_per_point_1m']} | {r_4n['bytes_per_point_1m']} |",
        "",
        f"**Scaling efficiency (N→4N): {eff:.3f}** (target ≥ 0.8)",
        "",
        "**Result identity across parallelism:** tier row counts and rounded",
        f"value checksums {'IDENTICAL ✓' if same else 'DIFFER ✗'} at both levels.",
        "",
        "## Hardware context",
        "",
        f"Pure-CPU multiprocessing probe on this VM: {hw[n]/1e6:.1f}M iters/s at",
        f"{n} procs vs {hw[4*n]/1e6:.1f}M at {4*n} procs — hardware-level 4×",
        f"efficiency {hw['hw_efficiency']}. N={n} keeps both levels within the",
        "machine's physical cores; 8→32 on this box caps at ~0.70 due to SMT.",
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
    print(json.dumps({"efficiency": round(eff, 3), "identical": same, "hw": hw["hw_efficiency"], "report": path}))


if __name__ == "__main__":
    main()
