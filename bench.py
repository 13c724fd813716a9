#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the headline pipeline + representative queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32).

Headline metric (BASELINE.json): rolled-up points/sec across the 1m/1h/1d
retention tiers computed from corrected series, plus compressed
bytes/point. Per-query wall times go in ``queries``.

Steal gating (r2 verdict #1): this VM shows bursty firecracker CPU steal
that inflated BENCH_r02 per-query numbers up to ~50×. Two distinct noise
modes exist and the harness defends against both:
(a) sustained contention — caught by single-thread probes: the run WAITS
for a clean window before each timed block (probe ≥ ``MIN_PROBE_IPS`` ≈
75% of the documented ambient-clean ~7.4M iters/s) and re-runs blocks
whose bracketing probes were dirty;
(b) stochastic multi-second stalls INSIDE an otherwise clean window
(measured: identical 1s queries spiking to ~20s with clean probes on both
sides) — bracket probes cannot see these, so every timed block always runs
at least TWICE and the per-query/per-section MINIMUM is kept (steal noise
is strictly one-sided).
``clean: true/false`` plus every raw probe reading and every raw rep is
stamped in the JSON, so a contended artifact is identifiable and a clean
one is reproducible. ``SPARK_GRAFT_BENCH_MAX_WAIT`` (seconds, default 600)
bounds each wait; a run that never sees a clean window emits
``clean: false``.

Scaling evidence (N vs 4N cores) is produced by BENCH/scaling.py, not here —
this script is the driver's per-round single-config probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from series_correction_project_updated_spark.operators.compress import (  # noqa: E402
    bytes_per_point,
    compress_rollup,
    decompress_to_points,
)
from series_correction_project_updated_spark.operators.correct import (  # noqa: E402
    correct_and_rollup,
    correct_rollup_lineage,
    correct_series,
)
from series_correction_project_updated_spark.operators.rollup import rollup_all_tiers  # noqa: E402
from series_correction_project_updated_spark.queries import resolve_query  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402

# r4: tracks the consolidated registry — q_rollup_1m→q_rollup_tiers,
# q_ivf_topk→q_ivf_recall, minhash/simhash rows-only variants→portable
# (hash-checked) ones; new r4 operators appended
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q_gap_detect",
    "q_rollup_tiers",
    "q_rollup_cascade_1h",
    "q_level_shift_days",
    "q_global_mad",
    "q_dedup_exact",
    "q_token_count",
    "q_knn_cosine",
    "q_ivf_recall",
    "q14_promo_revenue",
    "q_rolling_stats",
    "q_interpolate_nulls",
    "q_word_overlap_pairs",
    "q_correct_series",
    "q_fingerprint_dups",
    "q_outlier_flags",
    "q_dedup_resolve",
    "q_gapfill_linear",
    "q_minhash_portable",
    "q_simhash_portable",
    "q_retention_1h",
    "q_quantile_tier",
    "q_counter_tier",
    "q_downsample_m4",
    "q_interval_join",
    "q_asof_join",
    "q_asof_fwd_near",
    "q_compress_roundtrip",
    "q_stream_rollup_1m",
    "q_stats_tier",
    "q_histogram_tier",
    # r5 additions: the newly driver-checked layers + LTTB (bench-only
    # evidence, no registry slot). q_stream_tiers is excluded — its four
    # availableNow stream runs would dominate the sweep; the streaming cost
    # profile is represented by q_stream_rollup_1m.
    "q_hygiene",
    "q_sample_splits",
    "q_drift_classes",
    "q_analytics_tier",
    "q_smooth",
    "q_refresh_late",
    "q_lttb",
]

#: documented clean single-thread rate on this box (BENCH/BASELINE.md)
CLEAN_IPS = 7.4e6
MIN_PROBE_IPS = 0.75 * CLEAN_IPS


def _drain(df) -> None:
    """Force FULL execution of every column without collecting to the driver.

    ``.count()`` is not enough: Catalyst prunes final projections under a
    count (the round-3 'phantom timing' finding — a window/agg expression
    whose output feeds only a count may never execute). The ``noop`` sink
    materializes every output column through the complete plan, JVM-side."""
    df.write.format("noop").mode("overwrite").save()


def _cpu_probe(sec: float = 0.5) -> float:
    """Single-thread pure-CPU iterations/sec — a firecracker-steal signal.

    Recorded in the output JSON so a contended run is IDENTIFIABLE rather
    than silently slow."""
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < sec:
        x += 1
    return round(x / sec)


class _ProbeLog:
    def __init__(self) -> None:
        self.readings: list[float] = []
        self.waited_sec = 0.0

    def probe(self) -> float:
        p = _cpu_probe()
        self.readings.append(p)
        return p

    def wait_clean(self, max_wait: float) -> float:
        """Block until a probe reads clean or ``max_wait`` elapses; returns
        the final reading either way."""
        t0 = time.perf_counter()
        while True:
            p = self.probe()
            if p >= MIN_PROBE_IPS or time.perf_counter() - t0 >= max_wait:
                self.waited_sec += round(time.perf_counter() - t0, 1)
                return p
            time.sleep(15)


def _best_of(reps: int, fn) -> tuple[float, list[float]]:
    """min-of-N wall time (steal noise is one-sided) plus the raw reps."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def _run_headline(pts) -> tuple[dict, dict]:
    """One pass of the correct→rollup→compress pipeline block. Returns
    (timings, counts); the caller runs this whole block ≥2× and min-merges
    the timings (counts are data-determined and identical across passes)."""
    timings: dict[str, float] = {}

    n_points = 0

    def _staged():
        nonlocal n_points
        n_points = correct_series(pts).count()

    t_correct, _ = _best_of(1, _staged)

    # cache one corrected copy (outside the timed windows) for the rollup
    # and compress sections
    corrected = correct_series(pts)
    corrected.cache()
    corrected.count()

    # cache intermediate tiers: cascades are lazy over their parent, so
    # draining 1m/1h/1d without caching would recompute the 1m aggregation
    # three times — the real pipeline writes each tier to parquet instead
    t0 = time.perf_counter()
    tiers = rollup_all_tiers(corrected)
    tiers["1m"].cache()
    tiers["1h"].cache()
    for df in tiers.values():
        _drain(df)
    t_rollup = time.perf_counter() - t0
    # counts are data-determined — take them OUTSIDE the timed window from
    # the cached tiers (1d recomputes from the cached 1h parent, cheap)
    rolled = {name: df.count() for name, df in tiers.items()}

    # fused production path: correction + 1m tier in ONE kernel pass
    n_fused = 0

    def _fused():
        nonlocal n_fused
        n_fused = correct_and_rollup(pts, "1m").count()

    t_fused, _ = _best_of(1, _fused)
    timings["pipeline_fused_correct_1m"] = round(t_fused, 3)

    # fused + lineage: what run_pipeline actually executes (rollup AND the
    # lineage side table from the same single kernel pass)
    t0 = time.perf_counter()
    n_fused_lineage = correct_rollup_lineage(pts, "1m").count()
    t_fused_lineage = time.perf_counter() - t0
    timings["pipeline_fused_lineage_1m"] = round(t_fused_lineage, 3)

    t0 = time.perf_counter()
    comp = compress_rollup(tiers["1m"], "1m")
    comp.cache()
    _drain(comp)
    bpp_rows = bytes_per_point(comp).collect()
    t_compress = time.perf_counter() - t0
    bpp = float(bpp_rows[0]["bytes_per_point"]) if bpp_rows else None

    # decode path (r3 verdict #2: vectorized block decoder) — decompress
    # the cached 1m chunk store back to points
    n_decoded = 0

    def _decode():
        nonlocal n_decoded
        n_decoded = decompress_to_points(comp).count()

    t_decompress, _ = _best_of(1, _decode)
    timings["pipeline_decompress"] = round(t_decompress, 3)

    timings["pipeline_correct"] = round(t_correct, 3)
    timings["pipeline_rollup"] = round(t_rollup, 3)
    timings["pipeline_compress"] = round(t_compress, 3)
    corrected.unpersist()
    comp.unpersist()
    tiers["1m"].unpersist()
    tiers["1h"].unpersist()

    counts = {
        "rolled_points_total": sum(rolled.values()),
        "corrected_points": n_points,
        "compressed_bytes_per_point_1m": round(bpp, 3) if bpp else None,
        "fused_rolled_points_1m": n_fused,
        "fused_lineage_rows_1m": n_fused_lineage,
        "decoded_points_1m": n_decoded,
    }
    return timings, counts


def _run_sweep(spark, sf_dir) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # r5: several registry entries were consolidated into union queries
        # (q01+q14→q_pricing_promo etc.); the STANDALONE functions remain
        # defined, and benching them keeps per-query floor continuity across
        # rounds — resolve_query handles registry-or-module lookup.
        fn = resolve_query(name)
        t0 = time.perf_counter()
        _drain(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "600"))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    probes = _ProbeLog()

    # --- headline: correct -> rollup tiers -> compress, on the events table
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        F.col("user_id").cast("string").alias("series_key"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0).alias("t"),
        "value",
    )

    # Materialize input and JIT-warm the Python workers OUTSIDE the timed
    # windows (same protocol as BENCH/scaling.py): the first kernel job
    # otherwise pays parquet-footer reads + Arrow worker spin-up, which
    # inverted fused-vs-staged comparisons by up to 40% on this VM. The
    # warmup covers BOTH kernel shapes (plain and fused) so neither timed
    # section is the first of its plan shape.
    pts.cache()
    pts.count()
    correct_series(pts.limit(50_000)).count()
    correct_and_rollup(pts.limit(50_000), "1m").count()

    # headline block: ALWAYS ≥2 full passes (per-section min defeats the
    # stochastic in-window stalls bracket probes can't see); extra passes
    # while the bracketing probes are dirty, ≤3 total
    headline_raw: list[dict[str, float]] = []
    counts: dict = {}
    headline_clean = False
    for attempt in range(3):
        p_before = probes.wait_clean(max_wait)
        t, counts = _run_headline(pts)
        headline_raw.append(t)
        p_after = probes.probe()
        bracket_clean = min(p_before, p_after) >= MIN_PROBE_IPS
        headline_clean = headline_clean or (bracket_clean and attempt >= 1)
        if attempt >= 1 and bracket_clean:
            break
    timings: dict[str, float] = {}
    for key in headline_raw[0]:
        timings[key] = min(h[key] for h in headline_raw)

    # per-query sweeps: same policy — ≥2 sweeps always, ≤4 while the
    # bracket is dirty; keep the per-query MINIMUM
    sweep_raw: list[dict[str, float]] = []
    sweep_clean = False
    for attempt in range(4):
        p_before = probes.wait_clean(max_wait)
        sweep_raw.append(_run_sweep(spark, sf_dir))
        p_after = probes.probe()
        bracket_clean = min(p_before, p_after) >= MIN_PROBE_IPS
        if attempt >= 1 and bracket_clean:
            sweep_clean = True
            break
    for name in BENCH_QUERIES:
        timings[name] = min(s[name] for s in sweep_raw)

    total = round(sum(timings.values()), 3)
    pipeline_sec = timings["pipeline_correct"] + timings["pipeline_rollup"]
    extra = {
        "rolled_points_total": counts["rolled_points_total"],
        "rolled_points_per_sec": round(counts["rolled_points_total"] / pipeline_sec, 1),
        "corrected_points": counts["corrected_points"],
        "corrected_points_per_sec": round(
            counts["corrected_points"] / timings["pipeline_correct"], 1
        ),
        "compressed_bytes_per_point_1m": counts["compressed_bytes_per_point_1m"],
        "fused_rolled_points_1m": counts["fused_rolled_points_1m"],
        "fused_rolled_points_per_sec": round(
            counts["fused_rolled_points_1m"] / timings["pipeline_fused_correct_1m"], 1
        ),
        "fused_lineage_rows_1m": counts["fused_lineage_rows_1m"],
        "fused_lineage_sec": timings["pipeline_fused_lineage_1m"],
        "decoded_points_1m": counts["decoded_points_1m"],
        "decode_points_per_sec": round(
            counts["decoded_points_1m"] / timings["pipeline_decompress"], 1
        ),
        "encode_points_per_sec": round(
            counts["decoded_points_1m"] / timings["pipeline_compress"], 1
        ),
        "cpus": cpus,
        "warmup": "input cached + both kernel shapes pre-run",
        "headline_raw_sec": headline_raw,
        "sweep_raw_sec": sweep_raw,
        "steal_probe_ips": {
            "all": probes.readings,
            "min_clean_ips": MIN_PROBE_IPS,
            "waited_sec": probes.waited_sec,
        },
    }
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "clean": bool(headline_clean and sweep_clean),
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
