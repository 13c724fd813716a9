#!/usr/bin/env python
"""Compaction maintenance job — the small-file sweeper.

Runs after incremental ingest/refresh cycles against any
``bucket_date=``-partitioned store (point stores from
``refresh.write_points_partitioned`` / ``ingest.upsert_points``, tier
stores from ``retention.write_tier_partitioned``):

    spark-submit --py-files /tmp/engine.zip jobs/run_compaction.py \
        --store-dir /path/points_bydate --target-file-mb 128

Three actions per run:

1. recover: complete or discard staging left by a crashed previous run
   (``recover_orphan_staging`` — safe to run any time),
2. compact: rewrite only the partitions whose file count exceeds what
   their byte size justifies (everything else is left physically
   untouched),
3. report: per-run JSON with partitions scanned/compacted and the
   before/after file counts, so fleet schedulers can alert on
   fragmentation trends.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_spark.operators.compact import (  # noqa: E402
    compact_partitions,
    partition_file_stats,
    recover_orphan_staging,
)
from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store-dir", required=True, help="bucket_date=-partitioned store path")
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--min-files", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(app_name="compaction")
    spark.sparkContext.setLogLevel("ERROR")

    recovered = recover_orphan_staging(spark, args.store_dir)
    before = partition_file_stats(spark, args.store_dir)
    done = compact_partitions(
        spark,
        args.store_dir,
        target_file_bytes=args.target_file_mb * 1024 * 1024,
        min_files=args.min_files,
    )
    after = partition_file_stats(spark, args.store_dir)
    print(
        json.dumps(
            {
                "store_dir": args.store_dir,
                "recovered_swaps": recovered,
                "partitions": len(before),
                "compacted": done,
                "files_before": sum(s.files for s in before),
                "files_after": sum(s.files for s in after),
                "bytes_total": sum(s.bytes for s in after),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
