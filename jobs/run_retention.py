#!/usr/bin/env python
"""Retention maintenance job — the background policy runner.

Expires old data from written tier stores WITHOUT touching the pipeline
(retention must never filter a tier before a coarser tier cascades from
it, so it runs as a separate job, like production continuous-aggregate
policies):

    spark-submit --py-files /tmp/engine.zip jobs/run_retention.py \
        --tier-dir /path/out/rollup_1m_bydate --keep-days 90

Two actions per run against a ``bucket_date=``-partitioned tier store
(written via ``operators.retention.write_tier_partitioned``):

1. physical: drop whole partition directories strictly older than the
   cutoff (metadata-only, idempotent, conservative on straddling days),
2. report: rows remaining inside the horizon (logical retention — the
   filter readers apply — is a plain ``bucket_start >= cutoff`` predicate
   the partition layout prunes).

``--now`` pins the cutoff for reproducible runs; default is wall clock.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_spark.operators.retention import (  # noqa: E402
    apply_retention,
    expire_partition_dirs,
    list_partition_dirs,
)
from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier-dir", required=True, help="bucket_date=-partitioned tier path")
    ap.add_argument("--keep-days", type=float, required=True)
    ap.add_argument("--now", type=float, default=None, help="epoch seconds; default wall clock")
    args = ap.parse_args()

    now = args.now if args.now is not None else time.time()
    cutoff = now - args.keep_days * 86400.0
    # expiry runs through the Hadoop FileSystem API (spark-backed), so the
    # tier store may live on s3a://, hdfs://, or a local path alike
    spark = get_spark(app_name="retention")
    removed = expire_partition_dirs(args.tier_dir, cutoff, spark=spark)

    # A policy horizon older than ALL data removes every partition; reading
    # the now-empty store would raise (parquet can't infer a schema from
    # zero files), crashing after the deletes — report 0 instead (r3 ADVICE).
    if list_partition_dirs(args.tier_dir, spark=spark):
        tier = spark.read.parquet(args.tier_dir)
        remaining = apply_retention(tier, args.keep_days * 86400.0, now_ts=now).count()
    else:
        remaining = 0
    print(
        json.dumps(
            {
                "tier_dir": args.tier_dir,
                "cutoff": cutoff,
                "partitions_dropped": removed,
                "rows_within_horizon": remaining,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
