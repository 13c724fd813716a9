"""Quantify ingest dedup: hash-aggregate shape vs the naive window shape.

``dedup_points`` on the bare (key, t, value) schema is a pure-primitive
``max`` HashAggregate — map-side partials collapse duplicates BEFORE the
shuffle, so a duplicate-heavy batch shuffles only its distinct keys. The
naive alternative everyone writes first — ``row_number() over (partition
by key, t order by value desc) = 1`` — shuffles EVERY row and then sorts
each partition. Same output, structurally different cost; this records
the gap (and that it widens with duplicate fraction).

Protocol (bench-protocol note): interleaved reps, per-shape MIN, CPU
probes bracketing the block, row-count equality asserted.

Usage: python BENCH/ingest_bench.py [n_urls] [samples_per_url] [reps]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import MIN_PROBE_IPS, _cpu_probe
from series_correction_project_updated_spark.operators.ingest import dedup_points
from series_correction_project_updated_spark.session import get_spark
from series_correction_project_updated_spark.sources.synth import (
    generate_pages,
    pages_to_series,
)


def main():
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = pages_to_series(
        generate_pages(spark, n_urls=n_urls, samples_per_url=spp, seed=11, interval_sec=20)
    )
    # duplicate-heavy batch: every row redelivered once (50% dup fraction)
    batch = base.unionByName(base).cache()
    n_batch = batch.count()

    def run_hash():
        return dedup_points(batch).count()

    def run_window():
        w = Window.partitionBy("series_key", "t").orderBy(F.col("value").desc())
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .count()
        )

    n_hash, n_win = run_hash(), run_window()  # warm + equality
    assert n_hash == n_win, (n_hash, n_win)

    p_before = _cpu_probe()
    t_hash, t_win = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_hash()
        t_hash.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        run_window()
        t_win.append(round(time.perf_counter() - t0, 3))
    p_after = _cpu_probe()

    best_h, best_w = min(t_hash), min(t_win)
    print(
        json.dumps(
            {
                "metric": "ingest_dedup_hashagg_vs_window",
                "batch_rows": n_batch,
                "distinct_rows": n_hash,
                "dup_fraction": round(1 - n_hash / n_batch, 3),
                "hashagg_sec": best_h,
                "window_sec": best_w,
                "speedup": round(best_w / best_h, 3),
                "hashagg_rows_per_sec": round(n_batch / best_h),
                "reps_hashagg": t_hash,
                "reps_window": t_win,
                "probe_before_ips": p_before,
                "probe_after_ips": p_after,
                "clean": min(p_before, p_after) >= MIN_PROBE_IPS,
                "counts_equal": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
