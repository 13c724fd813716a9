"""Throughput of the quantile-digest and counter tiers at 10M points.

Same protocol as event_bench.py (probe-bracketed, min-of-reps,
noop-drained) on a deterministic 10M-point series table (10k series x
1k points, hot key at 8x): per-op seconds + points/sec for

  quantile_1m+1h     digest rollup + raw-free cascade (k=64)
  quantile_eval      p50/p95/p99 evaluated from the 1h digests
  counter_1m+1h      counter rollup + exactly-merging cascade
  counter_direct_1h  direct 1h rollup (cascade-vs-direct cost check)
  stats_1m+1h+eval   2D moment rollup, re-centering cascade, derived stats
  histogram_1m+1h+q  64-bin rollup, integer-merge cascade, p95 serving

Usage: python BENCH/tier_bench.py [n_series] [pts_per_series] [reps]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import MIN_PROBE_IPS, _cpu_probe, _drain
from series_correction_project_updated_spark.operators.counters import (
    counter_cascade,
    counter_rollup,
)
from series_correction_project_updated_spark.operators.quantile import (
    digest_quantiles,
    quantile_cascade,
    quantile_rollup,
)
from series_correction_project_updated_spark.session import get_spark


def synth_points(spark, n_series: int, pts: int):
    total = n_series * pts
    df = spark.range(0, total, 1, numPartitions=32).select(
        (F.col("id") % n_series).cast("string").alias("series_key"),
        (F.col("id") / n_series).cast("long").alias("i"),
    )
    hot = spark.range(0, pts * 7).select(
        F.lit("0").alias("series_key"),
        (F.col("id") + pts).cast("long").alias("i"),
    )
    df = df.unionByName(hot)
    h = F.abs(F.xxhash64("series_key", "i"))
    return df.select(
        "series_key",
        (1_700_000_000.0 + F.col("i") * 7.0).alias("t"),
        # counter-ish: mostly growing with occasional resets via modulo
        ((h % 1000).cast("double") + F.col("i") * 3.0 % 50000).alias("value"),
    )


def main():
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    s = synth_points(spark, n_series, pts).cache()
    n = s.count()

    # PHASE 1 — raw-scan rollups, timed while NO tier cache exists: the
    # cache manager matches plan-identical subtrees, so a cached 1m tier
    # would silently serve these ops from memory (caught: 0.23s "rollup"
    # over 10M points vs the real ~6.5s)
    from series_correction_project_updated_spark.operators.seasonal import seasonal_decompose
    from series_correction_project_updated_spark.operators.smooth import (
        ewma_smooth,
        holt_smooth,
    )

    from series_correction_project_updated_spark.operators.histogram import (
        histogram_cascade,
        histogram_quantile,
        histogram_rollup,
    )
    from series_correction_project_updated_spark.operators.stats import (
        stats_cascade,
        stats_eval,
        stats_rollup,
    )

    phase1 = {
        "quantile_rollup_1m": lambda: _drain(quantile_rollup(s, "1m", k=64)),
        "counter_rollup_1m": lambda: _drain(counter_rollup(s, "1m")),
        "counter_direct_1h": lambda: _drain(counter_rollup(s, "1h")),
        "stats_rollup_1m": lambda: _drain(stats_rollup(s, "1m")),
        "histogram_rollup_1m_b64": lambda: _drain(
            histogram_rollup(s, "1m", 0.0, 51000.0, 64)
        ),
        "timeweight_rollup_1m": lambda: _drain(
            __import__(
                "series_correction_project_updated_spark.operators.timeweight",
                fromlist=["time_weighted_rollup"],
            ).time_weighted_rollup(s, "1m")
        ),
        "stateagg_rollup_1m": lambda: _drain(
            __import__(
                "series_correction_project_updated_spark.operators.stateagg",
                fromlist=["state_rollup"],
            ).state_rollup(
                s.withColumn(
                    "state",
                    F.when(F.col("value") < 15000, "low")
                    .when(F.col("value") < 35000, "mid")
                    .otherwise("high"),
                ),
                "1m",
            )
        ),
        "ewma_smooth": lambda: _drain(ewma_smooth(s, 0.1)),
        "holt_smooth": lambda: _drain(holt_smooth(s, 0.3, 0.1)),
        "seasonal_decompose_p24": lambda: _drain(seasonal_decompose(s, 24)),
    }
    # content drift: own synthetic crawl table (20k urls × 10 crawls,
    # ~40-token pages, every 4th crawl rewritten) — JVM-generated text
    from series_correction_project_updated_spark.operators.drift import content_drift

    crawls = (
        spark.range(0, 200_000, 1, numPartitions=32)
        .select(
            (F.col("id") % 20_000).cast("string").alias("url"),
            (F.col("id") / 20_000).cast("long").alias("i"),
        )
        .select(
            "url",
            (1_700_000_000.0 + F.col("i") * 86400.0).alias("warc_ts"),
            F.concat_ws(
                " ",
                F.array_repeat(
                    F.format_string(
                        "tok%d", F.xxhash64("url", (F.col("i") / 4).cast("long")) % 5000
                    ),
                    40,
                ),
            ).alias("text"),
        )
        .cache()
    )
    n_crawls = crawls.count()
    phase1["content_drift_200k_crawls"] = lambda: _drain(
        content_drift(crawls, time_col="warc_ts")
    )
    # corpus-hygiene passes over the same 200k-doc text table
    from series_correction_project_updated_spark.operators.decontam import (
        flag_contaminated,
    )
    from series_correction_project_updated_spark.operators.repetition import (
        repetition_scores,
    )

    docs = crawls.select(
        F.concat_ws("#", "url", F.col("warc_ts").cast("string")).alias("doc_id"),
        "text",
    )
    bench_docs = docs.limit(200).select("text")
    phase1["decontam_13gram_200k_docs"] = lambda: _drain(
        flag_contaminated(docs, bench_docs, n=13)
    )
    phase1["repetition_scores_200k_docs"] = lambda: _drain(
        repetition_scores(docs, ns=(2, 3))
    )
    # PHASE 2 — tier-input ops, fed from cached 1m tiers (the intended
    # shape: cascades/eval read stored tiers, never raw)
    t1m_q = quantile_rollup(s, "1m", k=64)
    t1m_c = counter_rollup(s, "1m")
    t1m_s = stats_rollup(s, "1m")
    t1m_h = histogram_rollup(s, "1m", 0.0, 51000.0, 64)
    phase2 = {
        "quantile_cascade_1h": lambda: _drain(quantile_cascade(t1m_q, "1h", k=64)),
        "quantile_eval_p50_p95_p99": lambda: _drain(
            digest_quantiles(t1m_q, [0.5, 0.95, 0.99])
        ),
        "counter_cascade_1h": lambda: _drain(counter_cascade(t1m_c, "1h")),
        "stats_cascade_1h": lambda: _drain(stats_cascade(t1m_s, "1h")),
        "stats_eval_1m": lambda: _drain(stats_eval(t1m_s)),
        "histogram_cascade_1h": lambda: _drain(histogram_cascade(t1m_h, "1h")),
        "histogram_quantile_p95_1m": lambda: _drain(
            histogram_quantile(t1m_h, 0.95, 0.0, 51000.0)
        ),
    }
    # ACF over the 1m numeric tier (~1.1M buckets × 24 lags exploded)
    from series_correction_project_updated_spark.operators.lagcorr import autocorr
    from series_correction_project_updated_spark.operators.rollup import rollup

    t1m_n = rollup(s, "1m").select(
        "series_key", "bucket_start", F.col("vsum").alias("value")
    )
    phase2["lagcorr_acf24_1m_tier"] = lambda: _drain(autocorr(t1m_n, 24, 60.0))

    def _time(ops, results):
        for fn in ops.values():
            fn()  # warm
        for name, fn in ops.items():
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                times.append(round(time.perf_counter() - t0, 3))
            results[name] = {
                "sec": min(times),
                "reps": times,
                "points_per_sec": round(n / min(times)),
            }

    p_before = _cpu_probe()
    results: dict = {}
    _time(phase1, results)
    t1m_q.cache().count()
    t1m_c.cache().count()
    t1m_s.cache().count()
    t1m_h.cache().count()
    t1m_n.cache().count()
    _time(phase2, results)
    for doc_op in (
        "content_drift_200k_crawls",
        "decontam_13gram_200k_docs",
        "repetition_scores_200k_docs",
    ):
        d = results[doc_op]
        d["crawls"] = n_crawls
        d["points_per_sec"] = round(n_crawls / d["sec"])  # docs/s, not series pts
    p_after = _cpu_probe()

    print(
        json.dumps(
            {
                "metric": "tier_ops_throughput_10M",
                "points": n,
                "series": n_series,
                "ops": results,
                "probe_before_ips": p_before,
                "probe_after_ips": p_after,
                "clean": min(p_before, p_after) >= MIN_PROBE_IPS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
