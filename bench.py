#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the headline pipeline + representative queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32).

Headline metric (BASELINE.json): rolled-up points/sec across the 1m/1h/1d
retention tiers computed from corrected series, plus compressed
bytes/point. Per-query wall times go in ``queries``.

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
)
from series_correction_project_updated_spark.operators.correct import correct_series  # noqa: E402
from series_correction_project_updated_spark.operators.rollup import rollup_all_tiers  # noqa: E402
from series_correction_project_updated_spark.queries import REGISTRY  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q_gap_detect",
    "q_rollup_1m",
    "q_rollup_cascade_1h",
    "q_level_shift_days",
    "q_global_mad",
    "q_dedup_exact",
    "q_token_count",
    "q_knn_cosine",
    "q_ivf_topk",
    "q14_promo_revenue",
    "q_rolling_stats",
    "q_interpolate_nulls",
    "q_word_overlap_pairs",
    "q_correct_series",
    "q_minhash_pairs",
]


def _drain(df) -> int:
    """Force full execution without collecting rows to the driver."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    # --- headline: correct -> rollup tiers -> compress, on the events table
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        F.col("user_id").cast("string").alias("series_key"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0).alias("t"),
        "value",
    )
    from series_correction_project_updated_spark.operators.correct import correct_and_rollup

    # Materialize input and JIT-warm the Python workers OUTSIDE the timed
    # windows (same protocol as BENCH/scaling.py): the first kernel job
    # otherwise pays parquet-footer reads + Arrow worker spin-up, which
    # inverted fused-vs-staged comparisons by up to 40% on this VM.
    pts.cache()
    pts.count()
    correct_and_rollup(pts.limit(50_000), "1m").count()

    t0 = time.perf_counter()
    corrected = correct_series(pts)
    corrected.cache()
    n_points = corrected.count()
    t_correct = time.perf_counter() - t0

    t0 = time.perf_counter()
    tiers = rollup_all_tiers(corrected)
    rolled = {name: _drain(df) for name, df in tiers.items()}
    t_rollup = time.perf_counter() - t0

    # fused production path: correction + 1m tier in ONE kernel pass
    t0 = time.perf_counter()
    n_fused = correct_and_rollup(pts, "1m").count()
    t_fused = time.perf_counter() - t0
    timings["pipeline_fused_correct_1m"] = round(t_fused, 3)

    t0 = time.perf_counter()
    comp = compress_rollup(tiers["1m"], "1m")
    comp.cache()
    _drain(comp)
    bpp_rows = bytes_per_point(comp).collect()
    t_compress = time.perf_counter() - t0
    bpp = float(bpp_rows[0]["bytes_per_point"]) if bpp_rows else None

    total_rolled = sum(rolled.values())
    pipeline_sec = t_correct + t_rollup
    timings["pipeline_correct"] = round(t_correct, 3)
    timings["pipeline_rollup"] = round(t_rollup, 3)
    timings["pipeline_compress"] = round(t_compress, 3)
    corrected.unpersist()
    comp.unpersist()

    # --- per-query timings
    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        t0 = time.perf_counter()
        _drain(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "rolled_points_total": total_rolled,
                    "rolled_points_per_sec": round(total_rolled / pipeline_sec, 1),
                    "corrected_points": n_points,
                    "corrected_points_per_sec": round(n_points / t_correct, 1),
                    "compressed_bytes_per_point_1m": round(bpp, 3) if bpp else None,
                    "fused_rolled_points_1m": n_fused,
                    "fused_rolled_points_per_sec": round(n_fused / t_fused, 1),
                    "cpus": cpus,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
