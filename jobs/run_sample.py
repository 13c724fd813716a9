#!/usr/bin/env python
"""Corpus sampling job — deterministic shard/split construction.

Builds training-corpus subsets with the hash-derived samplers
(``operators/sampling``): the same command produces the same shard on
any cluster, any partition count, any day — and stays coordinated with
every other sampler keyed on the same id columns.

    spark-submit --py-files /tmp/engine.zip jobs/run_sample.py \
        --input /path/docs_parquet --out /path/shards \
        --splits train=0.98,val=0.01,test=0.01        # disjoint splits
    ... --rate 0.1                                     # Bernoulli sample
    ... --per-key 1000 --key-col domain [--weight-col w]  # per-key cap

Exactly one of --splits / --rate / --per-key. ``--salt`` rotates the
draw (default 0); re-running a crashed job with the same salt rewrites
identical shards (idempotent by construction, no checkpoint needed).
Splits are written ``partitionBy('split')`` so a consumer reads its
split as a pruned directory, not a scan. Prints ONE JSON report line.

Local smoke: python jobs/run_sample.py --synthetic 200x3 --out /tmp/s \
    --splits train=0.9,val=0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet path")
    ap.add_argument("--synthetic", help="generate pages: '<n_urls>x<samples>'")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-cols", default="url,warc_ts", help="row-identity columns (csv)")
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--splits", help="name=weight csv, weights summing to 1")
    ap.add_argument("--rate", type=float, help="Bernoulli keep-rate in [0,1]")
    ap.add_argument("--per-key", type=int, help="keep k rows per --key-col value")
    ap.add_argument("--key-col", help="stratum column for --per-key")
    ap.add_argument("--weight-col", help="weight column: per-key pick becomes A-ES weighted")
    args = ap.parse_args()

    modes = [m for m in (args.splits, args.rate, args.per_key) if m is not None]
    if len(modes) != 1:
        ap.error("exactly one of --splits / --rate / --per-key is required")
    if args.per_key is not None and not args.key_col:
        ap.error("--per-key requires --key-col")
    if args.per_key is None and (args.key_col or args.weight_col):
        # refuse rather than silently ignore: '--rate 0.1 --weight-col w'
        # would otherwise run an UNWEIGHTED Bernoulli with no warning
        ap.error("--key-col/--weight-col only apply to --per-key mode")

    spark = get_spark(app_name="corpus-sample")
    spark.sparkContext.setLogLevel("ERROR")

    from series_correction_project_updated_spark.operators.sampling import (  # noqa: E402
        bottom_k_sample,
        hash_bernoulli,
        hash_split,
        weighted_bottom_k,
    )

    if args.synthetic:
        from series_correction_project_updated_spark.sources.synth import generate_pages

        n_urls, samples = (int(x) for x in args.synthetic.split("x"))
        df = generate_pages(spark, n_urls=n_urls, samples_per_url=samples)
    elif args.input:
        df = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    id_cols = [c.strip() for c in args.id_cols.split(",") if c.strip()]
    rows_in = df.count()
    report = {"rows_in": rows_in, "salt": args.salt, "id_cols": id_cols, "out": args.out}

    if args.splits is not None:
        weights = {}
        for part in args.splits.split(","):
            name, w = part.split("=")
            weights[name.strip()] = float(w)
        labeled = hash_split(df, weights, id_cols, salt=args.salt)
        labeled.write.mode("overwrite").partitionBy("split").parquet(args.out)
        back = spark.read.parquet(args.out)
        counts = {r["split"]: r["count"] for r in back.groupBy("split").count().collect()}
        report.update({"mode": "splits", "weights": weights, "split_rows": counts})
    elif args.rate is not None:
        sampled = hash_bernoulli(df, args.rate, id_cols, salt=args.salt)
        sampled.write.mode("overwrite").parquet(args.out)
        kept = spark.read.parquet(args.out).count()
        report.update({"mode": "rate", "rate": args.rate, "rows_kept": kept})
    else:
        if args.weight_col:
            sampled = weighted_bottom_k(
                df, args.per_key, args.key_col, args.weight_col, id_cols, salt=args.salt
            )
        else:
            sampled = bottom_k_sample(df, args.per_key, args.key_col, id_cols, salt=args.salt)
        sampled.write.mode("overwrite").parquet(args.out)
        kept = spark.read.parquet(args.out).count()
        report.update(
            {"mode": "per_key", "k": args.per_key, "key_col": args.key_col, "rows_kept": kept}
        )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
