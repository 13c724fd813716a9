#!/usr/bin/env python
"""Scaling-evidence harness: same job, same input, N vs 4N cores.

Sandbox substitute for the north rule's two-cluster-size criterion (see
BASELINE.md "Scaling-evidence protocol"): run the identical pipeline at
``local[N]`` and ``local[4N]`` in separate JVMs, report throughput at both,
scaling efficiency = (thr_4N / thr_N) / 4, and assert the rolled-up tier
checksums are IDENTICAL across parallelism levels.

Noise robustness (this VM shows firecracker CPU steal in bursts): the two
levels are run ALTERNATELY (N, 4N, N, 4N, ...) with a fresh JVM per rep and
the fastest rep per level is kept — a noisy window degrades both levels
instead of silently poisoning one. A pure-CPU hardware probe runs before
each rep and is recorded; reps whose probe shows >25% degradation vs the
best probe are marked dirty in the report.

Default N=2 (→ 4N=8): this VM exposes 32 hardware threads on 16 physical
cores, and a pure-CPU multiprocessing probe scales only ~2.8×/4 from 8→32
workers (SMT sharing), so 8→32 cannot evidence ≥0.8 no matter how good the
job is. 2→8 stays within physical cores.

Writes BENCH/BASELINE.md. Usage: python BENCH/scaling.py [N] (default 2).
Env: SCALE_URLS (16000), SCALE_SAMPLES (800), SCALE_REPS (2 per level).
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


def run_worker(cores: int, n_urls: int, samples: int) -> dict:
    inner = os.environ.get("SCALE_INNER", "2")  # timed reps per JVM; best kept
    out = subprocess.run(
        [sys.executable, WORKER, str(cores), str(n_urls), str(samples)],
        capture_output=True,
        text=True,
        timeout=2400,
        check=True,
        env={**os.environ, "SCALE_REPS": inner},
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
    n_urls = int(os.environ.get("SCALE_URLS", "16000"))
    samples = int(os.environ.get("SCALE_SAMPLES", "800"))
    reps = int(os.environ.get("SCALE_REPS", "2"))

    hw = cpu_probe(n)
    runs: dict[int, list[dict]] = {n: [], 4 * n: []}
    probes: list[float] = []
    for rep in range(reps):
        for cores in (n, 4 * n):
            time.sleep(int(os.environ.get("SCALE_SETTLE_SEC", "60")))  # let the
            # previous JVM's teardown and page-cache flush drain before probing
            p = cpu_probe(n)
            probes.append(p[4 * n])  # absolute 4N-proc iters/s = steal signal
            rec = run_worker(cores, n_urls, samples)
            rec["probe_ips_4n"] = p[4 * n]
            runs[cores].append(rec)
            print(
                json.dumps({"rep": rep, "cores": cores, "work_sec": rec["work_sec"]}),
                file=sys.stderr,
            )

    best_probe = max(probes)
    for recs in runs.values():
        for r in recs:
            r["dirty"] = r["probe_ips_4n"] < 0.75 * best_probe
    r_n = min(runs[n], key=lambda r: r["work_sec"])
    r_4n = min(runs[4 * n], key=lambda r: r["work_sec"])

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
        f"{r_n['corrected_points']:,} corrected points), fresh JVM per rep,",
        "input materialized and Python workers warmed before the timed window,",
        f"levels run ALTERNATELY ({reps} reps each), fastest rep per level kept",
        "(filters firecracker CPU-steal bursts observed on this VM).",
        "",
        f"| metric | local[{n}] | local[{4*n}] |",
        "|---|---|---|",
        f"| correct + 1m tier sec | {r_n['sec_correct_1m']} | {r_4n['sec_correct_1m']} |",
        f"| 1h/1d cascades sec | {r_n['sec_cascades']} | {r_4n['sec_cascades']} |",
        f"| compress sec | {r_n['sec_compress']} | {r_4n['sec_compress']} |",
        f"| total work sec | {r_n['work_sec']} | {r_4n['work_sec']} |",
        f"| throughput (corrected points/sec) | {r_n['throughput_pts_per_sec']:,} | {r_4n['throughput_pts_per_sec']:,} |",
        f"| rolled-up points/sec (all tiers) | {r_n['rolled_points_per_sec']:,} | {r_4n['rolled_points_per_sec']:,} |",
        f"| rolled-up points (1m+1h+1d) | {r_n['rolled_points_total']:,} | {r_4n['rolled_points_total']:,} |",
        f"| compressed bytes/point (1m) | {r_n['bytes_per_point_1m']} | {r_4n['bytes_per_point_1m']} |",
        f"| kernel partitions | {r_n['n_partitions']} | {r_4n['n_partitions']} |",
        f"| shuffle partitions | {r_n['shuffle_partitions']} | {r_4n['shuffle_partitions']} |",
        "",
        f"**Scaling efficiency (N→4N): {eff:.3f}** (target ≥ 0.8)",
        "",
        "**Result identity across parallelism:** tier row counts and rounded",
        f"value checksums {'IDENTICAL ✓' if same else 'DIFFER ✗'} at both levels.",
        "",
        "## Skew profile (same input both levels)",
        "",
        f"Series length max/median: {r_n['series_max_len']:,}/{r_n['series_med_len']:,}"
        f" (hot url ×{r_n['series_max_len'] // max(r_n['series_med_len'],1)});"
        " kernel partition rows max/median: "
        f"{r_n['part_max_rows']:,}/{r_n['part_med_rows']:,} at local[{n}], "
        f"{r_4n['part_max_rows']:,}/{r_4n['part_med_rows']:,} at local[{4*n}].",
        "",
        "## Hardware context",
        "",
        f"Pure-CPU multiprocessing probe on this VM: {hw[n]/1e6:.1f}M iters/s at",
        f"{n} procs vs {hw[4*n]/1e6:.1f}M at {4*n} procs — hardware-level 4×",
        f"efficiency {hw['hw_efficiency']}. N={n} keeps both levels within the",
        "machine's physical cores; 8→32 on this box caps at ~0.70 due to SMT.",
        "Per-rep probe (4N-proc iters/s) is recorded in the raw JSON below;",
        "reps with probe <75% of the session best are flagged dirty.",
        "",
        "Raw worker JSON (best rep per level first, then all reps):",
        "```json",
        json.dumps(r_n),
        json.dumps(r_4n),
        *[json.dumps({k: r[k] for k in ("cores", "work_sec", "probe_ips_4n", "dirty")}) for recs in runs.values() for r in recs],
        "```",
    ]
    # BASELINE.md is the hand-curated evidence doc (multiple invocations
    # merged + methodology notes) — never clobber it from here. Each run
    # lands in its own stamped report for manual merging.
    path = os.path.join(HERE, f"scaling_run_{datetime.now(timezone.utc).strftime('%Y%m%dT%H%M%SZ')}.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": round(eff, 3), "identical": same, "hw": hw["hw_efficiency"], "report": path}))


if __name__ == "__main__":
    main()
