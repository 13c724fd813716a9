#!/usr/bin/env python
"""Focused gated re-floor for the compress-path bench entries after the
batch chunk encoder (encode_chunks) landed — the entries whose code
changed (pipeline_compress, q_compress_roundtrip) need floors measured
on the NEW code; old floors are retired per the re-floor protocol
(BENCH/BASELINE.md §Methodology). pipeline_decompress and a q01 ambient
control ride along.

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
from series_correction_project_updated_spark.operators.compress import (  # noqa: E402
    bytes_per_point,
    compress_rollup,
    decompress_to_points,
)
from series_correction_project_updated_spark.operators.correct import correct_series  # noqa: E402
from series_correction_project_updated_spark.operators.rollup import rollup_all_tiers  # noqa: E402
from series_correction_project_updated_spark.queries import resolve_query  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "4"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "600"))
    spark = get_spark(app_name="refloor-compress", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    probes = bench._ProbeLog()

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        F.col("user_id").cast("string").alias("series_key"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0).alias("t"),
        "value",
    )
    # warm + build the cached 1m tier OUTSIDE timed windows (same protocol
    # as bench._run_headline)
    pts.cache()
    pts.count()
    corrected = correct_series(pts)
    corrected.cache()
    corrected.count()
    tier_1m = rollup_all_tiers(corrected)["1m"]
    tier_1m.cache()
    tier_1m.count()
    # JIT-warm both timed shapes once
    compress_rollup(tier_1m.limit(5000), "1m").count()
    q01_fn = resolve_query("q01_pricing_summary")

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

    def _compress():
        # unpersist the previous rep's plan-identical cache FIRST — Spark
        # serves plan-identical frames from cache, which would turn reps
        # 2..N into cache reads (the plan-aliasing pitfall)
        prev = getattr(_compress, "last", None)
        if prev is not None:
            prev.unpersist(blocking=True)
        comp = compress_rollup(tier_1m, "1m")
        comp.cache()
        bench._drain(comp)
        bytes_per_point(comp).collect()
        _compress.last = comp  # hand to decode timing

    timed("pipeline_compress", _compress)
    comp = _compress.last

    timed("pipeline_decompress", lambda: decompress_to_points(comp).count())
    timed("q_compress_roundtrip", lambda: bench._drain(resolve_query("q_compress_roundtrip")(spark, sf_dir)))
    timed("q01_control", lambda: bench._drain(q01_fn(spark, sf_dir)))

    out["clean"] = all(
        min(b) >= bench.MIN_PROBE_IPS for bl in out["probes"].values() for b in bl
    )
    out["probe_readings"] = probes.readings
    out["sf"] = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
