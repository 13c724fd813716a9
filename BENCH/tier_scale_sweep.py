"""Paired 1x-vs-4x scaling sweep over the tier-op family.

Motivation: this VM's ambient CPU steal moves tens of percent between
invocations AND the pure-CPU register-bound probe underestimates the
degradation allocation-heavy Spark ops see (measured: histogram_quantile
at 17.4 us/row in a probe-"mildly dirty" window vs its 4.4 us/row clean
floor — while the probe read only ~25% down). Absolute floors from a
dirty window are therefore useless for a scale-extrapolation claim.

What IS steal-robust is the RATIO between two runs executed seconds
apart: for each op we time the 1x input (10M points) and the 4x input
(40M points) back-to-back, interleaved (1x, 4x, 1x, 4x), and report

    efficiency = (pts_per_sec at 4x) / (pts_per_sec at 1x)

Efficiency ~1.0 means the op's cost is linear in input size — the
per-round sf10x pipeline evidence, extended op-by-op to the whole tier
family. Values modestly below 1.0 at 40M rows on ONE box reflect cache/
bandwidth pressure, not plan structure (partition layout is pinned at 32
across scales; shapes are identical — verified via explain in tests).

Phase-1 ops (rollups over raw points) are timed while NO tier cache
exists (the cache manager matches plan-identical subtrees and would
silently serve a cached 1m tier). Tier caches for phase 2 are built
only after every phase-1 pair has run, at both scales.

Text ops (drift/decontam/repetition) scale their crawl table 200k -> 800k.

Usage: python BENCH/tier_scale_sweep.py [reps]   (default 2)
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import MIN_PROBE_IPS, _cpu_probe, _drain
from BENCH.tier_bench import synth_points
from series_correction_project_updated_spark.operators.counters import (
    counter_cascade,
    counter_rollup,
)
from series_correction_project_updated_spark.operators.decontam import (
    flag_contaminated,
)
from series_correction_project_updated_spark.operators.drift import content_drift
from series_correction_project_updated_spark.operators.histogram import (
    histogram_cascade,
    histogram_quantile,
    histogram_rollup,
)
from series_correction_project_updated_spark.operators.lagcorr import autocorr
from series_correction_project_updated_spark.operators.quantile import (
    digest_quantiles,
    quantile_cascade,
    quantile_rollup,
)
from series_correction_project_updated_spark.operators.repetition import (
    repetition_scores,
)
from series_correction_project_updated_spark.operators.rollup import rollup
from series_correction_project_updated_spark.operators.seasonal import (
    seasonal_decompose,
)
from series_correction_project_updated_spark.operators.smooth import (
    ewma_smooth,
    holt_smooth,
)
from series_correction_project_updated_spark.operators.stateagg import state_rollup
from series_correction_project_updated_spark.operators.stats import (
    stats_cascade,
    stats_eval,
    stats_rollup,
)
from series_correction_project_updated_spark.operators.timeweight import (
    time_weighted_rollup,
)
from series_correction_project_updated_spark.session import get_spark

SCALES = ((10_000, 1_000), (20_000, 2_000))  # 10M and 40M points


def crawl_table(spark, n_crawls: int):
    n_urls = n_crawls // 10
    return (
        spark.range(0, n_crawls, 1, numPartitions=32)
        .select(
            (F.col("id") % n_urls).cast("string").alias("url"),
            (F.col("id") / n_urls).cast("long").alias("i"),
        )
        .select(
            "url",
            (1_700_000_000.0 + F.col("i") * 86400.0).alias("warc_ts"),
            F.concat_ws(
                " ",
                F.array_repeat(
                    F.format_string(
                        "tok%d",
                        F.xxhash64("url", (F.col("i") / 4).cast("long")) % 5000,
                    ),
                    40,
                ),
            ).alias("text"),
        )
        .cache()
    )


def with_state(s):
    return s.withColumn(
        "state",
        F.when(F.col("value") < 15000, "low")
        .when(F.col("value") < 35000, "mid")
        .otherwise("high"),
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    inputs, sizes = [], []
    for ns, pts in SCALES:
        s = synth_points(spark, ns, pts).cache()
        inputs.append(s)
        sizes.append(s.count())

    # (name, op-builder taking the raw-points df)
    phase1 = [
        ("quantile_rollup_1m", lambda s: quantile_rollup(s, "1m", k=64)),
        ("counter_rollup_1m", lambda s: counter_rollup(s, "1m")),
        ("counter_direct_1h", lambda s: counter_rollup(s, "1h")),
        ("stats_rollup_1m", lambda s: stats_rollup(s, "1m")),
        ("histogram_rollup_1m_b64", lambda s: histogram_rollup(s, "1m", 0.0, 51000.0, 64)),
        ("timeweight_rollup_1m", lambda s: time_weighted_rollup(s, "1m")),
        ("stateagg_rollup_1m", lambda s: state_rollup(with_state(s), "1m")),
        ("ewma_smooth", lambda s: ewma_smooth(s, 0.1)),
        ("holt_smooth", lambda s: holt_smooth(s, 0.3, 0.1)),
        ("seasonal_decompose_p24", lambda s: seasonal_decompose(s, 24)),
    ]

    def timed_pair(name, dfs, results, denom):
        """Interleave scales: warm each once, then reps alternating."""
        for df in dfs:
            _drain(df)  # warm (JIT + cache fill)
        t = {0: [], 1: []}
        for _ in range(reps):
            for lvl, df in enumerate(dfs):
                t0 = time.perf_counter()
                _drain(df)
                t[lvl].append(round(time.perf_counter() - t0, 3))
        r1x, r4x = min(t[0]), min(t[1])
        eff = (denom[1] / r4x) / (denom[0] / r1x)
        results[name] = {
            "sec_1x": r1x,
            "sec_4x": r4x,
            "reps_1x": t[0],
            "reps_4x": t[1],
            "pts_per_sec_1x": round(denom[0] / r1x),
            "pts_per_sec_4x": round(denom[1] / r4x),
            "efficiency": round(eff, 3),
        }
        print(
            f"{name}: 1x {r1x}s  4x {r4x}s  eff {eff:.3f}",
            file=sys.stderr,
        )

    p_before = _cpu_probe()
    results = {}
    for name, build in phase1:
        timed_pair(name, [build(s) for s in inputs], results, sizes)

    # text ops: 200k vs 800k crawls
    crawls = [crawl_table(spark, n) for n in (200_000, 800_000)]
    crawl_sizes = [c.count() for c in crawls]
    docs = [
        c.select(
            F.concat_ws("#", "url", F.col("warc_ts").cast("string")).alias("doc_id"),
            "text",
        )
        for c in crawls
    ]
    bench_docs = docs[0].limit(200).select("text")
    timed_pair(
        "content_drift",
        [content_drift(c, time_col="warc_ts") for c in crawls],
        results,
        crawl_sizes,
    )
    timed_pair(
        "decontam_13gram",
        [flag_contaminated(d, bench_docs, n=13) for d in docs],
        results,
        crawl_sizes,
    )
    timed_pair(
        "repetition_scores",
        [repetition_scores(d, ns=(2, 3)) for d in docs],
        results,
        crawl_sizes,
    )
    for c in crawls:
        c.unpersist()

    # phase 2: tier-input ops over cached 1m tiers, both scales
    tiers = []
    for s in inputs:
        tq = quantile_rollup(s, "1m", k=64).cache()
        tc = counter_rollup(s, "1m").cache()
        ts = stats_rollup(s, "1m").cache()
        th = histogram_rollup(s, "1m", 0.0, 51000.0, 64).cache()
        tn = (
            rollup(s, "1m")
            .select("series_key", "bucket_start", F.col("vsum").alias("value"))
            .cache()
        )
        for t_ in (tq, tc, ts, th, tn):
            t_.count()
        tiers.append((tq, tc, ts, th, tn))

    phase2 = [
        ("quantile_cascade_1h", lambda t: quantile_cascade(t[0], "1h", k=64)),
        ("quantile_eval_p50_p95_p99", lambda t: digest_quantiles(t[0], [0.5, 0.95, 0.99])),
        ("counter_cascade_1h", lambda t: counter_cascade(t[1], "1h")),
        ("stats_cascade_1h", lambda t: stats_cascade(t[2], "1h")),
        ("stats_eval_1m", lambda t: stats_eval(t[2])),
        ("histogram_cascade_1h", lambda t: histogram_cascade(t[3], "1h")),
        ("histogram_quantile_p95_1m", lambda t: histogram_quantile(t[3], 0.95, 0.0, 51000.0)),
        ("lagcorr_acf24_1m_tier", lambda t: autocorr(t[4], 24, 60.0)),
    ]
    for name, build in phase2:
        timed_pair(name, [build(t) for t in tiers], results, sizes)

    p_after = _cpu_probe()
    effs = sorted(r["efficiency"] for r in results.values())
    print(
        json.dumps(
            {
                "metric": "tier_ops_scaling_1x_to_4x",
                "points_1x": sizes[0],
                "points_4x": sizes[1],
                "ops": results,
                "efficiency_median": effs[len(effs) // 2],
                "efficiency_min": effs[0],
                "probe_before_ips": p_before,
                "probe_after_ips": p_after,
                "clean": min(p_before, p_after) >= MIN_PROBE_IPS,
            },
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
