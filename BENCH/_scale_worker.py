#!/usr/bin/env python
"""One scaling-run worker: full pipeline at a given core count, JSON to stdout.

Invoked by BENCH/scaling.py as a subprocess so each parallelism level gets a
fresh JVM. Excluded from the timed window: JVM startup, input generation and
materialization, and Python-worker spin-up (a warmup pandas-UDF pass).

Pipeline shape mirrors production (plans/pipeline.py): correct → 1m tier →
parquet sink, cascade 1h/1d from the sink, compress from the sink. No
persist-each-step — in-memory columnar cache builds contend under high
thread counts and would distort the scaling signal. The pipeline runs
``reps`` times (fresh output dir each time) and the FASTEST rep is reported,
which filters transient VM noise.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from series_correction_project_updated_spark.operators.compress import (  # noqa: E402
    bytes_per_point,
    compress_rollup,
)
from series_correction_project_updated_spark.operators.correct import correct_and_rollup  # noqa: E402
from series_correction_project_updated_spark.operators.rollup import cascade  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402
from series_correction_project_updated_spark.sources.synth import (  # noqa: E402
    generate_pages,
    pages_to_series,
)


def main() -> None:
    cores = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    reps = int(os.environ.get("SCALE_REPS", "3"))

    # Partitioning is a property of the JOB, not the cluster size: on a real
    # N→4N executor comparison the data layout stays fixed and only
    # parallelism changes. Size partitions for the LARGER level (4× its
    # cores) so both levels run identical tasks — at the smaller level they
    # just queue deeper. Conflating partition count with core count makes
    # the small level run 4× fatter tasks whose working set blows the cache,
    # which corrupts the comparison (measured: 66 vs 36 µs·core/point).
    n_part = int(os.environ.get("SCALE_PARTITIONS", "32"))
    spark = get_spark(
        app_name=f"scale-{cores}", master=f"local[{cores}]", shuffle_partitions=n_part
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 20s sampling: 1m buckets actually aggregate (~3 points each) and the
    # 1h/1d cascades downsample for real (~×50/×24), matching the retention
    # profile the rollup layer exists for.
    interval = int(os.environ.get("SCALE_INTERVAL", "20"))
    pages = generate_pages(spark, n_urls=n_urls, samples_per_url=samples, interval_sec=interval)
    points = pages_to_series(pages).repartition(n_part, "series_key").persist()
    n_in = points.count()  # materialize input outside the timed window
    points.mapInPandas(lambda it: it, schema=points.schema).count()  # worker spin-up

    # skew profile (untimed): series-length and partition-row distribution
    slen = points.groupBy("series_key").count()
    s_stats = slen.agg(
        F.max("count").alias("mx"), F.expr("median(count)").alias("md")
    ).collect()[0]
    import pyspark.sql.functions as _F

    prow = points.groupBy(_F.spark_partition_id().alias("p")).count()
    p_stats = prow.agg(
        _F.max("count").alias("mx"), _F.expr("median(count)").alias("md")
    ).collect()[0]

    best = None
    for _rep in range(reps):
        d = tempfile.mkdtemp(prefix="scale_")
        try:
            t0 = time.perf_counter()
            correct_and_rollup(points, "1m", num_partitions=n_part).write.mode(
                "overwrite"
            ).parquet(f"{d}/r1m")
            t1 = time.perf_counter()
            r1m = spark.read.parquet(f"{d}/r1m")
            cascade(r1m, "1h").write.mode("overwrite").parquet(f"{d}/r1h")
            r1h = spark.read.parquet(f"{d}/r1h")
            cascade(r1h, "1d").write.mode("overwrite").parquet(f"{d}/r1d")
            t2 = time.perf_counter()
            compress_rollup(r1m, "1m", num_partitions=n_part).write.mode(
                "overwrite"
            ).parquet(f"{d}/comp")
            t3 = time.perf_counter()

            rec = {
                "sec_correct_1m": round(t1 - t0, 3),
                "sec_cascades": round(t2 - t1, 3),
                "sec_compress": round(t3 - t2, 3),
                "work_sec": round(t3 - t0, 3),
            }
            if best is None or rec["work_sec"] < best["rec"]["work_sec"]:
                tier_counts, checksums = {}, {}
                for name in ("r1m", "r1h", "r1d"):
                    df = spark.read.parquet(f"{d}/{name}")
                    tier_counts[name[1:]] = df.count()
                    row_hash = F.xxhash64(
                        "series_key",
                        "bucket_start",
                        "cnt",
                        F.round("vsum", 6),
                        F.round("vmin", 6),
                        F.round("vmax", 6),
                        F.round("vfirst", 6),
                        F.round("vlast", 6),
                    )
                    checksums[name[1:]] = df.select(F.bit_xor(row_hash).alias("c")).collect()[0]["c"]
                bpp = bytes_per_point(spark.read.parquet(f"{d}/comp")).collect()
                n_corrected = tier_counts["1m"] and spark.read.parquet(f"{d}/r1m").agg(
                    F.sum("cnt")
                ).collect()[0][0]
                best = {
                    "rec": rec,
                    "tier_counts": tier_counts,
                    "checksums": checksums,
                    "bpp": round(float(bpp[0]["bytes_per_point"]), 4) if bpp else None,
                    "n_corrected": int(n_corrected),
                }
        finally:
            shutil.rmtree(d, ignore_errors=True)

    rec = best["rec"]
    print(
        json.dumps(
            {
                "cores": cores,
                "reps": reps,
                "input_points": n_in,
                "corrected_points": best["n_corrected"],
                "tier_counts": best["tier_counts"],
                "tier_checksums": best["checksums"],
                "rolled_points_total": sum(best["tier_counts"].values()),
                **rec,
                "throughput_pts_per_sec": round(best["n_corrected"] / rec["work_sec"], 1),
                "rolled_points_per_sec": round(
                    sum(best["tier_counts"].values()) / rec["work_sec"], 1
                ),
                "bytes_per_point_1m": best["bpp"],
                "n_partitions": n_part,
                "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
                "series_max_len": int(s_stats["mx"]),
                "series_med_len": int(s_stats["md"]),
                "part_max_rows": int(p_stats["mx"]),
                "part_med_rows": int(p_stats["md"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
