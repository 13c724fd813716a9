#!/usr/bin/env python
"""Focused gated re-floor for the fused-kernel bench entries after the
partition-level run-boundary tier rollup landed (operators/correct.py
``_bucket_rollup_partition``) — the two entries whose code changed
(pipeline_fused_correct_1m, pipeline_fused_lineage_1m) need floors
measured on the NEW code; old floors are retired per the re-floor
protocol (BENCH/BASELINE.md §Methodology). q01 and q_correct_series
(kernel path WITHOUT the fused rollup — unchanged code) ride along as
ambient controls.

Cache state replicates bench.py's at the moment it times these entries:
pts, corrected and the 1m tier cached/materialized outside the window.

Prints one JSON line with per-entry raw reps + minima + probe readings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (reuse _ProbeLog/_drain/MIN_PROBE_IPS)
from series_correction_project_updated_spark.operators.correct import (  # noqa: E402
    correct_and_rollup,
    correct_rollup_lineage,
    correct_series,
)
from series_correction_project_updated_spark.operators.rollup import rollup_all_tiers  # noqa: E402
from series_correction_project_updated_spark.queries import resolve_query  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "4"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "600"))
    spark = get_spark(app_name="refloor-fused", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    probes = bench._ProbeLog()

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        F.col("user_id").cast("string").alias("series_key"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0).alias("t"),
        "value",
    )
    pts.cache()
    pts.count()
    corrected = correct_series(pts)
    corrected.cache()
    corrected.count()
    tier_1m = rollup_all_tiers(corrected)["1m"]
    tier_1m.cache()
    tier_1m.count()
    # JIT/Arrow-warm both timed shapes once on a small slice
    correct_and_rollup(pts.limit(50_000), "1m").count()
    correct_rollup_lineage(pts.limit(50_000), "1m").count()

    out: dict = {"reps": {}, "min": {}, "probes": {}}

    def timed(name: str, fn) -> None:
        times, brackets = [], []
        for _ in range(reps):
            p0 = probes.wait_clean(max_wait)
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
            brackets.append((p0, probes.probe()))
        out["reps"][name] = times
        out["min"][name] = min(times)
        out["probes"][name] = brackets

    timed("pipeline_fused_correct_1m", lambda: correct_and_rollup(pts, "1m").count())
    timed("pipeline_fused_lineage_1m", lambda: correct_rollup_lineage(pts, "1m").count())
    timed(
        "q_correct_series",
        lambda: bench._drain(resolve_query("q_correct_series")(spark, sf_dir)),
    )
    timed(
        "q01_pricing_summary",
        lambda: bench._drain(resolve_query("q01_pricing_summary")(spark, sf_dir)),
    )

    out["min_probe_ips"] = bench.MIN_PROBE_IPS
    print(json.dumps(out))


if __name__ == "__main__":
    main()
