#!/usr/bin/env python
"""Corpus-hygiene job — the per-crawl filter-signal builder.

Runs the webtext passes over a pages table and writes one row of filter
signals per crawl, the table every downstream consumer (dedup, trainer
sampling, recrawl scheduling) joins against:

    spark-submit --py-files /tmp/engine.zip jobs/run_hygiene.py \
        --input /path/pages_parquet --out /path/hygiene \
        [--benchmark /path/benchmark_parquet] [--strip-www]

Steps (each an operator documented in docs/COVERAGE.md):

1. ``canonicalize_url`` — series identity; variants merge BEFORE any
   history-dependent pass,
2. ``content_drift``    — first/unchanged/cosmetic/rewrite per recrawl
   (+ ``drift_summary`` per url),
3. ``repetition_scores`` — Gopher boilerplate signals per crawl,
4. ``flag_contaminated`` — benchmark 13-gram overlap (only when
   ``--benchmark`` is given; a parquet of (text) rows).

Outputs under --out: ``signals/`` (one row per crawl: url, warc_ts,
change, hamming, repetition + contamination columns), ``url_summary/``
(per-url volatility). Prints ONE JSON report line.

Local smoke: python jobs/run_hygiene.py --synthetic 200x10 --out /tmp/h
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path (url, warc_ts, text, ...)")
    ap.add_argument("--synthetic", help="generate pages: '<n_urls>x<samples>'")
    ap.add_argument("--benchmark", help="parquet of benchmark rows with a text column")
    ap.add_argument("--out", required=True)
    ap.add_argument("--strip-www", action="store_true")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--hamming-threshold", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="corpus-hygiene")
    spark.sparkContext.setLogLevel("ERROR")

    from series_correction_project_updated_spark.operators.drift import (  # noqa: E402
        content_drift,
        drift_summary,
    )
    from series_correction_project_updated_spark.operators.repetition import (  # noqa: E402
        repetition_scores,
    )
    from series_correction_project_updated_spark.operators.urls import (  # noqa: E402
        canonicalize_url,
    )

    if args.synthetic:
        from series_correction_project_updated_spark.sources.synth import generate_pages

        n_urls, samples = (int(x) for x in args.synthetic.split("x"))
        pages = generate_pages(spark, n_urls=n_urls, samples_per_url=samples)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    pages = pages.withColumn(
        "url", canonicalize_url("url", strip_www=args.strip_www)
    ).where(F.col("url").isNotNull())

    drift = content_drift(pages, hamming_threshold=args.hamming_threshold)
    # crawl identity for the joins below: (url, t, exact_hash) — the
    # text hash disambiguates duplicate capture timestamps (two fetches
    # at the same warc_ts with different bodies), matching drift's own
    # tiebreaker; a (url, t)-only key would fan the join out 2×2 there
    crawl_id = F.concat_ws(
        "#",
        "url",
        F.col("warc_ts").cast("string"),
        F.xxhash64(F.coalesce(F.col("text"), F.lit(""))).cast("string"),
    )
    rep = repetition_scores(
        pages.select(crawl_id.alias("doc_id"), "text"), ns=(2, 3)
    )
    drift_id = F.concat_ws(
        "#", drift["url"], F.col("t").cast("string"), F.col("exact_hash").cast("string")
    )
    signals = drift.join(
        rep.withColumnRenamed("doc_id", "_crawl_id"),
        drift_id == F.col("_crawl_id"),
        "left",
    ).drop("_crawl_id")

    n_contaminated = None
    if args.benchmark:
        from series_correction_project_updated_spark.operators.decontam import (
            flag_contaminated,
        )

        bench = spark.read.parquet(args.benchmark)
        docs = pages.select(crawl_id.alias("doc_id"), "text")
        flags = flag_contaminated(docs, bench, n=args.ngram)
        signals = signals.join(
            flags.withColumnRenamed("doc_id", "_crawl_id"),
            F.concat_ws(
                "#",
                signals["url"],
                F.col("t").cast("string"),
                signals["exact_hash"].cast("string"),
            )
            == F.col("_crawl_id"),
            "left",
        ).drop("_crawl_id")

    sig_path = os.path.join(args.out, "signals")
    signals.write.mode("overwrite").parquet(sig_path)
    sum_path = os.path.join(args.out, "url_summary")
    drift_summary(spark.read.parquet(sig_path)).write.mode("overwrite").parquet(sum_path)

    sig = spark.read.parquet(sig_path)
    by_change = {
        r["change"]: r["cnt"]
        for r in sig.groupBy("change").agg(F.count("*").alias("cnt")).collect()
    }
    if args.benchmark:
        # from the written table — a flags.count() here would re-run the
        # whole n-gram explode + broadcast join a second time
        n_contaminated = sig.where("contaminated").count()
    report = {
        "rows": sig.count(),
        "urls": spark.read.parquet(sum_path).count(),
        "by_change": by_change,
        "contaminated": n_contaminated,
        "signals_path": sig_path,
        "url_summary_path": sum_path,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
