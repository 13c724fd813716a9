#!/usr/bin/env python
"""N-vs-4N parity worker: run the full pipeline (correct → 1m tier →
cascade 1h/1d → compress) at a given core count in a FRESH JVM and print
tier counts + value checksums as one JSON line.

Invoked by tests/test_scaling_parity.py at two parallelism levels; the
test asserts the outputs are identical. Partition LAYOUT is fixed (a
property of the job, not the cluster size — BENCH/_scale_worker.py) so
only scheduling differs between levels.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from series_correction_project_updated_spark.operators.compress import (  # noqa: E402
    compress_rollup,
)
from series_correction_project_updated_spark.operators.correct import (  # noqa: E402
    correct_and_rollup,
)
from series_correction_project_updated_spark.operators.rollup import cascade  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402
from series_correction_project_updated_spark.sources.synth import (  # noqa: E402
    generate_pages,
    pages_to_series,
)


def main() -> None:
    cores = int(sys.argv[1])
    n_urls = int(sys.argv[2])
    samples = int(sys.argv[3])
    n_part = 16  # fixed layout at both levels

    spark = get_spark(
        app_name=f"parity-{cores}", master=f"local[{cores}]", shuffle_partitions=n_part
    )
    spark.sparkContext.setLogLevel("ERROR")
    # 120s sampling × 150 samples = 5h per series: the 1m tier aggregates,
    # the 1h cascade downsamples ~5×, the 1d cascade collapses to one
    pages = generate_pages(spark, n_urls=n_urls, samples_per_url=samples, interval_sec=120)
    points = pages_to_series(pages)

    d = tempfile.mkdtemp(prefix=f"parity{cores}_")
    try:
        correct_and_rollup(points, "1m", num_partitions=n_part).write.mode(
            "overwrite"
        ).parquet(f"{d}/r1m")
        r1m = spark.read.parquet(f"{d}/r1m")
        cascade(r1m, "1h").write.mode("overwrite").parquet(f"{d}/r1h")
        cascade(spark.read.parquet(f"{d}/r1h"), "1d").write.mode("overwrite").parquet(
            f"{d}/r1d"
        )
        compress_rollup(r1m, "1m", num_partitions=n_part).write.mode(
            "overwrite"
        ).parquet(f"{d}/comp")

        out: dict = {"cores": cores, "counts": {}, "checksums": {}}
        for name in ("r1m", "r1h", "r1d"):
            df = spark.read.parquet(f"{d}/{name}")
            out["counts"][name] = df.count()
            # float sums are order-bit-exact here because the kernel emits
            # per-series (one task each) and the tier stores per-bucket
            # scalars — round(6) guards only the cascade's reassociation
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
            out["checksums"][name] = (
                df.select(F.bit_xor(row_hash).alias("c")).collect()[0]["c"]
            )
        comp = spark.read.parquet(f"{d}/comp")
        out["counts"]["comp"] = comp.count()
        # compressed blocks must be BYTE-identical across levels
        out["checksums"]["comp"] = (
            comp.select(
                F.bit_xor(
                    F.xxhash64("series_key", "chunk_start", "n_points", "payload")
                ).alias("c")
            ).collect()[0]["c"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
