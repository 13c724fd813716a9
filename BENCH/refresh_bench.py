"""Quantify invalidation-based refresh vs full recompute (operators/refresh).

Deployment shape: the point store lives on disk partitioned by UTC day
(``write_points_partitioned``); a late batch arrives touching a sliver of
(series, bucket) regions confined to a few days. Compare

  full     = rollup(read whole store)                       # recompute world
  refresh  = refresh_tier(standing, store, late,
                          prune_partition_col="bucket_date")# touched days only

and, for the correction kernel (recompute cost >> scan cost):

  full     = correct_series(read whole store)
  refresh  = recorrect_series(store, late, old)             # touched series only

Both paths are materialized via count()/checksum; ``old`` is round-tripped
through parquet so Spark's cache-manager plan-matching can't satisfy the
"full" run from the cached standing result. The tier refresh's 100 TB win
is SCAN VOLUME (untouched day directories never open); the kernel refresh's
win is COMPUTE (untouched series never re-corrected) and shows at any scale.

Usage: python BENCH/refresh_bench.py [n_urls] [samples_per_url]
Prints one JSON line.
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.correct import correct_series
from series_correction_project_updated_spark.operators.refresh import (
    invalidated_buckets,
    recorrect_series,
    refresh_tier,
    write_points_partitioned,
)
from series_correction_project_updated_spark.operators.rollup import rollup
from series_correction_project_updated_spark.session import get_spark
from series_correction_project_updated_spark.sources.synth import (
    generate_pages,
    pages_to_series,
)


def checksum(df):
    return df.select(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("vsum"), 6)).alias("s"),
    ).collect()[0]


def main():
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="refresh_bench_")

    try:
        pts = pages_to_series(
            generate_pages(spark, n_urls=n_urls, samples_per_url=spp, seed=11, interval_sec=20)
        )
        write_points_partitioned(pts.repartition(32), f"{tmp}/points")
        store = spark.read.parquet(f"{tmp}/points")
        n_pts = store.count()

        # late batch: rows from 1% of series, confined to the first day
        t0_min = store.agg(F.min("t")).collect()[0][0]
        keys = [
            r[0]
            for r in store.select("series_key")
            .distinct()
            .orderBy("series_key")
            .limit(max(1, n_urls // 100))
            .collect()
        ]
        late = (
            store.filter(
                F.col("series_key").isin(keys) & (F.col("t") < t0_min + 86400)
            )
            .sample(0.1, seed=5)
            .drop("bucket_date")
            .cache()
        )
        n_late = late.count()

        standing = rollup(store, "1m").cache()  # stand-in for persisted tier
        n_buckets = standing.count()
        inv = invalidated_buckets(late, "1m")
        n_inv = inv.count()
        days_store = store.select("bucket_date").distinct().count()
        days_touched = (
            inv.select(
                F.date_from_unix_date(F.floor(F.col("bucket_start") / 86400).cast("int"))
            )
            .distinct()
            .count()
        )

        t0 = time.monotonic()
        full = checksum(rollup(spark.read.parquet(f"{tmp}/points"), "1m"))
        t_full = time.monotonic() - t0

        t0 = time.monotonic()
        refr = checksum(
            refresh_tier(
                standing, store, late, "1m", prune_partition_col="bucket_date"
            )
        )
        t_refresh = time.monotonic() - t0

        assert full.n == refr.n, (full, refr)
        assert abs(full.s - refr.s) <= 1e-6 * max(1.0, abs(full.s)), (full, refr)

        # kernel path — old corrected output materialized on disk
        correct_series(store.drop("bucket_date")).write.mode("overwrite").parquet(
            f"{tmp}/old"
        )
        old = spark.read.parquet(f"{tmp}/old")

        t0 = time.monotonic()
        n_full_k = correct_series(
            spark.read.parquet(f"{tmp}/points").drop("bucket_date")
        ).count()
        t_full_k = time.monotonic() - t0

        t0 = time.monotonic()
        n_refr_k = recorrect_series(
            store.drop("bucket_date"), late, old
        ).count()
        t_refr_k = time.monotonic() - t0
        assert n_full_k == n_refr_k, (n_full_k, n_refr_k)

        print(
            json.dumps(
                {
                    "metric": "refresh_vs_full_recompute",
                    "points": n_pts,
                    "late_rows": n_late,
                    "tier_buckets": n_buckets,
                    "invalidated_buckets": n_inv,
                    "invalidated_frac": round(n_inv / n_buckets, 6),
                    "store_day_partitions": days_store,
                    "touched_day_partitions": days_touched,
                    "tier_full_sec": round(t_full, 3),
                    "tier_refresh_sec": round(t_refresh, 3),
                    "tier_speedup": round(t_full / t_refresh, 2),
                    "kernel_full_sec": round(t_full_k, 3),
                    "kernel_recorrect_sec": round(t_refr_k, 3),
                    "kernel_speedup": round(t_full_k / t_refr_k, 2),
                    "checksums_equal": True,
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
