#!/usr/bin/env python
"""One scaling-run worker: full pipeline at a given core count, JSON to stdout.

Invoked by BENCH/scaling.py as a subprocess so each parallelism level gets a
fresh JVM. Startup and input generation are excluded from the timed section
(the scaling protocol measures the JOB, not JVM warmup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from series_correction_project_updated_spark.operators.compress import (  # noqa: E402
    bytes_per_point,
    compress_rollup,
)
from series_correction_project_updated_spark.operators.correct import correct_series  # noqa: E402
from series_correction_project_updated_spark.operators.rollup import rollup_all_tiers  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402
from series_correction_project_updated_spark.sources.synth import (  # noqa: E402
    generate_pages,
    pages_to_series,
)


def main() -> None:
    cores = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    spark = get_spark(
        app_name=f"scale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = generate_pages(spark, n_urls=n_urls, samples_per_url=samples)
    points = pages_to_series(pages).persist()
    n_in = points.count()  # warmup + materialize input outside the timed window

    t0 = time.perf_counter()
    corrected = correct_series(points).persist()
    n_corrected = corrected.count()
    t_correct = time.perf_counter() - t0

    t0 = time.perf_counter()
    tiers = rollup_all_tiers(corrected)
    tier_counts = {}
    checksums = {}
    for name, df in tiers.items():
        df = df.persist()
        tier_counts[name] = df.count()
        checksums[name] = df.select(
            F.sum(
                F.xxhash64(
                    "series_key",
                    "bucket_start",
                    "cnt",
                    F.round("vsum", 6),
                    F.round("vmin", 6),
                    F.round("vmax", 6),
                    F.round("vfirst", 6),
                    F.round("vlast", 6),
                )
            ).alias("c")
        ).collect()[0]["c"]
    t_rollup = time.perf_counter() - t0

    t0 = time.perf_counter()
    comp = compress_rollup(tiers["1m"], "1m").persist()
    comp.count()
    bpp = bytes_per_point(comp).collect()
    t_compress = time.perf_counter() - t0

    total_rolled = sum(tier_counts.values())
    work_sec = t_correct + t_rollup + t_compress
    # shuffle/task stats from the status API
    sc = spark.sparkContext
    print(
        json.dumps(
            {
                "cores": cores,
                "input_points": n_in,
                "corrected_points": n_corrected,
                "tier_counts": tier_counts,
                "tier_checksums": checksums,
                "rolled_points_total": total_rolled,
                "sec_correct": round(t_correct, 3),
                "sec_rollup": round(t_rollup, 3),
                "sec_compress": round(t_compress, 3),
                "work_sec": round(work_sec, 3),
                "throughput_pts_per_sec": round(n_corrected / work_sec, 1),
                "bytes_per_point_1m": round(float(bpp[0]["bytes_per_point"]), 4) if bpp else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
