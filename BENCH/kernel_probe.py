#!/usr/bin/env python
"""Isolate where correct_series wall time goes at sf0.1 local[32].

Experiments (each min-of-N, noop-sink or count as noted):
  E1 baseline      correct_series(pts).count()
  E2 compute-only  same kernel but emits ONE row per series (no 3.6M-row
                   Arrow return) — isolates input+shuffle+Python compute
  E3 no-shuffle    kernel over pre-clustered cached input (assume_clustered)
  E4 partitions    E1 at num_partitions 32 / 64 / 128 / 256
  E5 batched-out   E1 with a partition-level batched output (one frame per
                   partition instead of one per series)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from series_correction_project_updated_spark.operators.correct import correct_series  # noqa: E402
from series_correction_project_updated_spark.oracle import correction as oracle  # noqa: E402
from series_correction_project_updated_spark.schema import CORRECTED_POINTS  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("PROBE_REPS", "3"))


def best_of(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return min(ts), ts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="kernel-probe")
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        F.col("user_id").cast("string").alias("series_key"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0).alias("t"),
        "value",
    )
    pts.cache()
    print("input rows", pts.count())
    # warm both shapes
    correct_series(pts.limit(50_000)).count()

    results = {}

    t, raw = best_of(lambda: correct_series(pts).count())
    results["E1_baseline_128"] = (t, raw)

    cfg = dict(oracle.DEFAULT_CONFIG)

    def _compute_only(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for key, grp in pdf.groupby("series_key", sort=False):
            frame = grp[["t", "value"]]
            out = oracle.process_series(frame, "t", "value", cfg)
            yield pd.DataFrame({"series_key": [key], "t": [0.0], "value": [float(len(out))]})

    def run_compute_only():
        n = spark.sparkContext.defaultParallelism * 4
        pts.repartition(n, "series_key").mapInPandas(
            _compute_only, schema=CORRECTED_POINTS
        ).write.format("noop").mode("overwrite").save()

    t, raw = best_of(run_compute_only)
    results["E2_compute_only"] = (t, raw)

    clustered = pts.repartition(128, "series_key").cache()
    clustered.count()
    t, raw = best_of(lambda: correct_series(clustered, assume_clustered=True).count())
    results["E3_no_shuffle"] = (t, raw)
    clustered.unpersist()

    for n in (32, 64, 256):
        t, raw = best_of(lambda n=n: correct_series(pts, num_partitions=n).count())
        results[f"E4_parts_{n}"] = (t, raw)

    def _batched(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        ts_list, vs_list, keys, lens = [], [], [], []
        for key, grp in pdf.groupby("series_key", sort=False):
            frame = grp[["t", "value"]]
            out = oracle.process_series(frame, "t", "value", cfg)
            ts_list.append(out["t"].to_numpy(dtype=np.float64))
            vs_list.append(out["value"].to_numpy(dtype=np.float64))
            keys.append(key)
            lens.append(len(out))
        del pdf, chunks
        yield pd.DataFrame(
            {
                "series_key": np.repeat(np.asarray(keys, dtype=object), lens),
                "t": np.concatenate(ts_list) if ts_list else np.array([]),
                "value": np.concatenate(vs_list) if vs_list else np.array([]),
            }
        )

    def run_batched():
        n = spark.sparkContext.defaultParallelism * 4
        pts.repartition(n, "series_key").mapInPandas(
            _batched, schema=CORRECTED_POINTS
        ).count()

    t, raw = best_of(run_batched)
    results["E5_batched_out"] = (t, raw)

    # E6: batched output + noop sink (no count) to split JVM count cost
    def run_batched_noop():
        n = spark.sparkContext.defaultParallelism * 4
        pts.repartition(n, "series_key").mapInPandas(
            _batched, schema=CORRECTED_POINTS
        ).write.format("noop").mode("overwrite").save()

    t, raw = best_of(run_batched_noop)
    results["E6_batched_noop"] = (t, raw)

    t, raw = best_of(
        lambda: correct_series(pts).write.format("noop").mode("overwrite").save()
    )
    results["E7_baseline_noop"] = (t, raw)

    for k, (t, raw) in results.items():
        print(f"{k:22s} min={t:7.3f}  raw={raw}")
    spark.stop()


if __name__ == "__main__":
    main()
