#!/usr/bin/env python
"""spark-submit entry point: materialize the tier family from a point
store — numeric rollups, quantile digests, counter aggregates,
time-weighted integrals, regression moments, fixed-bin histograms — each
cascaded 1m -> 1h -> 1d and written as ``bucket_date=``-partitioned
parquet (the layout retention expiry and partition pruning operate on;
coarser tiers are built from the FINER TIER's store, never from raw,
so the job's raw scan count is exactly one per family).

Cluster usage (north rule: spark-submit --py-files on multi-executor):

    python -m zipfile -c /tmp/engine.zip series_correction_project_updated_spark
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        jobs/run_tiers.py --input /path/points_parquet --out /path/tiers \
        --families numeric,quantile,counter

Local smoke:

    python jobs/run_tiers.py --synthetic 50x200 --out /tmp/tiers
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_spark.operators.retention import write_tier_partitioned  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402

TIERS = ["1m", "1h", "1d"]


def _families(spark, k: int, hist_range: tuple[float, float, int] = (0.0, 100.0, 32)):
    from series_correction_project_updated_spark.operators import (
        counters,
        histogram,
        quantile,
        stats,
        timeweight,
    )
    from series_correction_project_updated_spark.operators.rollup import cascade, rollup

    lo, hi, nbins = hist_range
    return {
        "numeric": (lambda pts: rollup(pts, "1m"), cascade),
        "quantile": (
            lambda pts: quantile.quantile_rollup(pts, "1m", k=k),
            lambda fine, tier: quantile.quantile_cascade(fine, tier, k=k),
        ),
        "counter": (
            lambda pts: counters.counter_rollup(pts, "1m"),
            counters.counter_cascade,
        ),
        "timeweight": (
            lambda pts: timeweight.time_weighted_rollup(pts, "1m"),
            timeweight.time_weighted_cascade,
        ),
        "stats": (
            lambda pts: stats.stats_rollup(pts, "1m"),
            stats.stats_cascade,
        ),
        "histogram": (
            lambda pts: histogram.histogram_rollup(pts, "1m", lo, hi, nbins),
            histogram.histogram_cascade,
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="points parquet path (series_key, t, value)")
    ap.add_argument("--synthetic", help="generate pages: '<n_urls>x<samples>'")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--families", default="numeric,quantile,counter,timeweight,stats,histogram"
    )
    ap.add_argument("--k", type=int, default=64, help="quantile digest size")
    ap.add_argument(
        "--hist",
        default="0:100:32",
        help="histogram lo:hi:nbins (fixed-bin family range)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="tier-build")
    if args.synthetic:
        from series_correction_project_updated_spark.sources.synth import (
            generate_pages,
            pages_to_series,
        )

        n_urls, samples = (int(x) for x in args.synthetic.split("x"))
        pts = pages_to_series(generate_pages(spark, n_urls=n_urls, samples_per_url=samples))
    elif args.input:
        pts = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    lo, hi, nbins = args.hist.split(":")
    fams = _families(spark, args.k, (float(lo), float(hi), int(nbins)))
    report: dict = {"out": args.out, "tiers": {}}
    for fam in args.families.split(","):
        if fam not in fams:
            ap.error(f"unknown family {fam!r} (have {sorted(fams)})")
        build_1m, cascade_fn = fams[fam]
        fine = None
        for tier in TIERS:
            t0 = time.perf_counter()
            df = build_1m(pts) if tier == "1m" else cascade_fn(fine, tier)
            path = f"{args.out}/{fam}_{tier}"
            write_tier_partitioned(df, path)
            stored = spark.read.parquet(path)
            report["tiers"][f"{fam}_{tier}"] = {
                "rows": stored.count(),
                "sec": round(time.perf_counter() - t0, 3),
                "path": path,
            }
            # cascade reads the STORE it just wrote (bucket_date pruning
            # applies downstream), not the in-memory lineage
            fine = stored.drop("bucket_date")
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
