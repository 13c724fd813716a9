#!/usr/bin/env python
"""Generic steal-gated interleaved A/B timing harness (guide §1).

Register variants as zero-arg callables; the harness waits for a clean CPU
window (same probe protocol as bench.py), then runs variants round-robin for
N rounds keeping every raw rep, and reports per-variant minima. Interleaving
makes slow-window drift hit all variants equally; minima defeat the one-sided
stall noise documented in BENCH/BASELINE.md.
"""

from __future__ import annotations

import time

CLEAN_IPS = 7.4e6
MIN_PROBE_IPS = 0.75 * CLEAN_IPS


def cpu_probe(sec: float = 0.4) -> float:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < sec:
        x += 1
    return x / sec


def wait_clean(max_wait: float = 240.0) -> float:
    t0 = time.perf_counter()
    while True:
        p = cpu_probe()
        if p >= MIN_PROBE_IPS or time.perf_counter() - t0 >= max_wait:
            return p
        time.sleep(10)


def ab(variants: dict, rounds: int = 5, warmup: bool = True, max_wait: float = 240.0):
    """variants: {name: fn}. Returns {name: (min, [raw...], [probe...])}."""
    raw = {k: [] for k in variants}
    probes = {k: [] for k in variants}
    if warmup:
        for fn in variants.values():
            fn()
    for _ in range(rounds):
        for name, fn in variants.items():
            p = wait_clean(max_wait)
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            raw[name].append(dt)
            probes[name].append(round(p / 1e6, 2))
    out = {}
    for name in variants:
        out[name] = (min(raw[name]), raw[name], probes[name])
        print(f"{name:28s} min={min(raw[name]):7.3f}  raw={raw[name]}  probeM={probes[name]}")
    return out
