#!/usr/bin/env python
"""spark-submit entry point for the full pipeline.

Cluster usage (north rule: spark-submit --py-files on multi-executor):

    python -m zipfile -c /tmp/engine.zip series_correction_project_updated_spark
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        jobs/run_pipeline.py --input /path/pages_parquet --out /path/out

Local smoke:

    python jobs/run_pipeline.py --synthetic 100x200 --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet/iceberg path")
    ap.add_argument("--synthetic", help="generate pages: '<n_urls>x<samples>'")
    ap.add_argument("--out", required=True)
    ap.add_argument("--window-size", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=3.0)
    ap.add_argument("--job-id", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="series-correction-pipeline")
    if args.synthetic:
        from series_correction_project_updated_spark.sources.synth import generate_pages

        n_urls, samples = (int(x) for x in args.synthetic.split("x"))
        pages = generate_pages(spark, n_urls=n_urls, samples_per_url=samples)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    cfg = PipelineConfig(correction={"window_size": args.window_size, "threshold": args.threshold})
    summary = run_pipeline(spark, pages, args.out, cfg, job_id=args.job_id)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
