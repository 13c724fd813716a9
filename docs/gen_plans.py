#!/usr/bin/env python
"""Generate docs/PLANS.md: physical-plan audit of the headline queries.

Evidence that the declarative layer actually gets the plans we designed for:
filters and column pruning reach the parquet scan (PushedFilters/ReadSchema),
dim joins broadcast, the correction kernel has exactly one shuffle, and
whole-stage codegen covers the native operators.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_spark.queries import resolve_query  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

AUDIT = {
    "q01_pricing_summary": [
        ("filter pushed to scan", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("column pruning (no l_comment-ish cols)", r"ReadSchema: [^\n]*l_returnflag"),
        ("whole-stage codegen", "CODEGEN"),
    ],
    "q03_top_orders": [
        ("customer dim broadcast", r"BroadcastHashJoin"),
        ("segment filter pushed", r"PushedFilters: \[[^\]]*EqualTo\(c_mktsegment,BUILDING\)"),
        ("top-k via TakeOrderedAndProject", r"TakeOrderedAndProject"),
    ],
    "q05_nation_revenue": [
        ("nation+region broadcast", r"BroadcastHashJoin"),
        ("whole-stage codegen", "CODEGEN"),
    ],
    "q14_promo_revenue": [
        ("part dim broadcast", r"BroadcastHashJoin"),
        ("shipdate range pushed", r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_shipdate"),
    ],
    "q_gap_detect": [
        ("median agg then broadcast join back", r"BroadcastHashJoin"),
        ("single window sort per series", r"Window"),
    ],
    "q_rollup_tiers": [
        ("pure hash aggregates, no window (all 3 tiers)", r"HashAggregate"),
        ("events scan prunes to 3 cols", r"ReadSchema: struct<ts:timestamp[^\n]*user_id|ReadSchema: struct<user_id"),
        ("union of tiers, no join", r"(?s)^(?!.*(SortMergeJoin|CartesianProduct))"),
    ],
    "q_interpolate_nulls": [
        ("native window functions (no Python)", r"RunningWindowFunction|Window"),
        ("each window expression evaluated ONCE (4, not 10 — r4 fix)", "WIN_EXPRS_4"),
        ("whole-stage codegen", "CODEGEN"),
    ],
    "q_correct_series": [
        ("exactly one exchange before the kernel", None),  # counted below
        ("Arrow-batched Python (mapInPandas)", r"MapInPandas|ArrowEvalPython|PythonMapInArrow"),
    ],
    "q_fingerprint_dups": [
        ("NO Python in plan (JVM regexp_replace + xxhash64)", "NO_PYTHON"),
        ("whole-stage codegen", "CODEGEN"),
    ],
    "q_outlier_flags": [
        ("NO Python in plan (native W3-W5 detector)", "NO_PYTHON"),
        ("single window over series clustering", r"Window"),
    ],
    "q_overview_table": [
        ("averages dim broadcast (reference avg_lookup)", r"BroadcastHashJoin"),
        ("NO Python in plan", "NO_PYTHON"),
    ],
    "q_minhash_portable": [
        # r6: the portable md5 shingle hash moved into ONE Arrow batch UDF
        # (the JVM md5->conv chain degraded ~7x under session heap churn)
        ("portable shingle hash via ONE Arrow projection", r"ArrowEvalPython"),
        ("band-bucket equi-join (no cartesian)", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
    ],
    "q_simhash_portable": [
        ("JVM token hashing feeds ONE Arrow vote fold", r"ArrowEvalPython|MapInPandas"),
        ("no cartesian / no extra shuffle stages", r"(?s)^(?!.*CartesianProduct)"),
    ],
    "q_retention_1h": [
        ("NO Python in plan (pure bucket_start predicate)", "NO_PYTHON"),
        ("hash aggregate tier + scalar-subquery cutoff filter", r"HashAggregate"),
    ],
    "q_downsample_m4": [
        # r4: aggregate shape — struct min/max partial aggs, no window sort
        ("NO Python in plan (struct min/max aggregate M4)", "NO_PYTHON"),
        ("pure hash aggregate — no Window, no per-bucket sort", r"HashAggregate"),
        ("map-side partial aggregation before the exchange", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
        ("role explode via Generate", r"Generate|Expand"),
    ],
    "q_interval_join": [
        # r4 late: bucket decomposition — the whole point is that the
        # range predicate plans as an EQUI-join, not a nested loop
        ("NO Python in plan (bucket-decomposed range join)", "NO_PYTHON"),
        ("equi-join on (key, bucket) — hash/merge join present", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
        ("NO nested-loop / cartesian fallback", r"(?s)^(?!.*(BroadcastNestedLoopJoin|CartesianProduct))"),
        ("interval bucket explode via Generate", r"Generate"),
    ],
    "q_asof_join": [
        ("NO Python in plan (union + running-last window)", "NO_PYTHON"),
        ("no join operator at all - window shape", r"(?s)^(?!.*(SortMergeJoin|CartesianProduct))"),
    ],
    "q_asof_fwd_near": [
        ("NO Python in plan (union + running-first/nearest windows)", "NO_PYTHON"),
        ("no join operator at all - window shape", r"(?s)^(?!.*(SortMergeJoin|CartesianProduct))"),
    ],
    "q_stats_tier": [
        ("NO Python in plan (primitive moment sums + eval algebra)", "NO_PYTHON"),
        ("pure hash aggregates, no window", r"HashAggregate"),
        ("map-side partial aggregation before the exchange", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "q_histogram_tier": [
        ("NO Python in plan (sum(when) counters + zip_with merge)", "NO_PYTHON"),
        ("explode of stored counts via Generate", r"Generate"),
        ("no join operator anywhere", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
    ],
    "q_quantile_tier": [
        # digest tier: JVM hash agg feeds Arrow compression; cascade and
        # evaluation are further mapInPandas passes with no own shuffle
        ("Arrow-batched digest compress/eval (mapInPandas)", r"MapInPandas"),
        ("events scan prunes to ts/user_id/value (no props)", r"(?s)^(?!.*ReadSchema: [^\n]*props)"),
        # r6: +1 pre-sort exchange so the range sampler re-reads shuffle
        # output instead of re-running both digest Arrow passes
        ("4 exchanges: rollup agg + cascade agg + pre-sort + final sort", "EXCHANGES_4"),
        ("map-side partial aggregation before the rollup exchange", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "q_compress_roundtrip": [
        ("Arrow-batched codec both ways (mapInPandas x2)", r"MapInPandas"),
        # 1m agg + compress repartition + final orderBy = 3; the DECODE
        # side adds none of its own (chunks are independent → mapInPandas
        # directly over the compressed store, r4)
        # r6: +1 pre-sort exchange (sampling would re-run encode+decode)
        ("decode adds NO shuffle of its own (4 total: agg+repartition+pre-sort+sort)", "EXCHANGES_4"),
    ],
    # --- r5: the newly driver-checked layers ---
    "q_hygiene": [
        # r6: the repetition n-gram profile is ONE shuffle-free Arrow pass
        ("repetition profile via ONE Arrow projection (rest JVM)", r"ArrowEvalPython"),
        ("benchmark n-gram side broadcast into the doc-gram explode", r"BroadcastHashJoin"),
        ("gram windows explode via Generate (pipelined, not materialized)", r"Generate"),
    ],
    "q_sample_splits": [
        ("NO Python in plan (hash filters + window top-k)", "NO_PYTHON"),
        ("bottom-k rides WindowGroupLimit (partial top-k below the exchange)", r"WindowGroupLimit"),
        ("no join anywhere (samplers are filters/projections/windows)", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
    ],
    "q_drift_classes": [
        # r6: the content_drift frame is localCheckpointed (it feeds both
        # union arms), so the final plan reads the materialized RDD — the
        # Arrow fold and lag window live in the checkpoint-build plan
        ("both arms read the ONE materialized drift frame", r"Scan ExistingRDD[\s\S]*Scan ExistingRDD"),
        ("summary arm aggregates with map-side partials", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
        ("no cartesian", r"(?s)^(?!.*CartesianProduct)"),
    ],
    "q_analytics_tier": [
        ("NO Python in plan (all five ops native: explode/agg/window/fold)", "NO_PYTHON"),
        ("segment split via Generate (timeweight/stateagg bucket edges)", r"Generate"),
        ("map-side partial aggregation before exchanges", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "q_smooth": [
        # r6: EWMA+Holt fused into ONE kernel pass (one scan, one
        # repartition, one Arrow boundary instead of two of each)
        ("ONE fused Arrow smoother pass", r"MapInPandas"),
        ("single scan (fused arms, no union of passes)", "SCANS_1"),
        ("no join anywhere", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
    ],
    "q_refresh_late": [
        ("NO Python in plan (refresh is joins + aggregates)", "NO_PYTHON"),
        ("invalidation set broadcast (semi/anti) — the store never shuffles on it", r"BroadcastHashJoin"),
        ("no cartesian / nested loop", r"(?s)^(?!.*(BroadcastNestedLoopJoin|CartesianProduct))"),
    ],
    "q_lttb": [
        ("Arrow-batched kernel (mapInPandas over whole partitions)", r"MapInPandas"),
        # r6: +1 pre-sort exchange (sampling would re-run the LTTB kernel)
        ("one repartition + pre-sort + final sort only", "EXCHANGES_3"),
    ],
    "q_gapfill_linear": [
        ("Arrow-batched kernel (mapInPandas over whole partitions)", r"MapInPandas"),
        ("range exchange on the SMALL pre-expansion input", r"rangepartitioning\(series_key"),
        ("global order via partition-local sort — global=false, no post-kernel shuffle of the 36×-expanded output", r"Arguments: \[series_key[^\n]*t#\d+ ASC NULLS FIRST\], false"),
        ("exactly one exchange total", "EXCHANGES_1"),
    ],
}

PYTHON_NODES = r"MapInPandas|ArrowEvalPython|BatchEvalPython|PythonMapInArrow|FlatMapGroupsInPandas"


def _refresh_tier_pruned(spark):
    """Non-registry extra: refresh_tier against a day-partitioned store
    with prune_partition_col — the plan must show static partition
    pruning on the point scan and broadcast semi/anti joins (never a
    shuffle of the store on the invalidation key)."""
    import tempfile

    from pyspark.sql import functions as F

    from series_correction_project_updated_spark.operators.refresh import (
        refresh_tier,
        write_points_partitioned,
    )
    from series_correction_project_updated_spark.operators.rollup import rollup
    from series_correction_project_updated_spark.sources.synth import (
        generate_pages,
        pages_to_series,
    )

    tmp = tempfile.mkdtemp(prefix="plans_refresh_")
    pts = pages_to_series(generate_pages(spark, n_urls=6, samples_per_url=60, seed=4))
    write_points_partitioned(pts, f"{tmp}/points")
    disk = spark.read.parquet(f"{tmp}/points")
    t0 = pts.agg(F.min("t")).collect()[0][0]
    late = pts.filter(F.col("t") < t0 + 86400).sample(0.2, seed=2)
    standing = rollup(pts, "1m")
    return refresh_tier(standing, disk, late, "1m", prune_partition_col="bucket_date")


def _read_range_pruned(spark):
    """Non-registry extra: read_range over a parquet-backed compressed
    store — the [t_min, t_max] chunk-stat filter must reach the parquet
    scan (PushedFilters), i.e. chunks are eliminated by row-group stats
    before a single payload byte feeds the decode UDF."""
    import tempfile

    from series_correction_project_updated_spark.operators.compress import (
        compress_rollup,
        read_range,
    )
    from series_correction_project_updated_spark.operators.rollup import rollup
    from series_correction_project_updated_spark.sources.synth import (
        generate_pages,
        pages_to_series,
    )

    tmp = tempfile.mkdtemp(prefix="plans_readrange_")
    pts = pages_to_series(generate_pages(spark, n_urls=6, samples_per_url=120, seed=7))
    compress_rollup(rollup(pts, "1m"), "1m", chunk_buckets=64).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/store")
    store = spark.read.parquet(f"{tmp}/store")
    return read_range(store, t_lo=1_700_000_000, t_hi=1_800_000_000)


def _bucketed_kernel(spark):
    """Non-registry extra: the correction kernel over a bucketed store
    read (sources/bucketstore) — the scan must stay bucketed and the whole
    job must plan with ZERO exchanges (the shuffle was paid at write)."""
    import tempfile

    from series_correction_project_updated_spark.operators.correct import correct_series
    from series_correction_project_updated_spark.sources.bucketstore import (
        read_points_bucketed,
        write_points_bucketed,
    )
    from series_correction_project_updated_spark.sources.synth import (
        generate_pages,
        pages_to_series,
    )

    tmp = tempfile.mkdtemp(prefix="plans_bucket_")
    pts = pages_to_series(generate_pages(spark, n_urls=6, samples_per_url=60, seed=9))
    write_points_bucketed(pts, "plans_bucket_store", buckets=4, path=f"{tmp}/store")
    return correct_series(
        read_points_bucketed(spark, "plans_bucket_store"), assume_clustered=True
    )


def _ingest_dedup(spark):
    """Non-registry extra: point-store ingest dedup on the bare schema —
    must plan as a pure-primitive HashAggregate (map-side partials), never
    the SortAggregate a struct max_by would force."""
    from series_correction_project_updated_spark.operators.ingest import dedup_points
    from series_correction_project_updated_spark.sources.synth import (
        generate_pages,
        pages_to_series,
    )

    pts = pages_to_series(generate_pages(spark, n_urls=6, samples_per_url=60, seed=10))
    return dedup_points(pts.unionByName(pts.sample(0.3, seed=1)))


def _counter_tier(spark):
    """Non-registry extra: counter increase/rate tier — one raw-point
    shuffle, a JVM higher-order fold (no Python anywhere), and a lag
    window over TIER rows only."""
    from pyspark.sql import functions as F

    from series_correction_project_updated_spark.operators.counters import counter_rollup

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_key"),
        F.col("ts").cast("timestamp_ltz").cast("double").alias("t"),
        "value",
    )
    return counter_rollup(ev, "1m")


def _events_series(spark):
    from pyspark.sql import functions as F

    return spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_key"),
        F.col("ts").alias("t"),
        "value",
    )


def _stats_tier(spark):
    """Non-registry extra: 2D-moment stats tier — ONE map-side-combining
    hash aggregate (six primitive sums over a bucket-relative projection),
    zero Python, zero joins."""
    from series_correction_project_updated_spark.operators.stats import stats_rollup

    return stats_rollup(_events_series(spark), "1h")


def _histogram_tier(spark):
    """Non-registry extra: fixed-bin histogram tier — ONE hash aggregate
    of nbins+2 sum(when) counters; the shuffle carries counter partials,
    never rows."""
    from series_correction_project_updated_spark.operators.histogram import histogram_rollup

    return histogram_rollup(_events_series(spark), "1h", 0.0, 1000.0, 32)


# plans audited OUTSIDE the 50-entry driver registry (operator surface
# with no registry slot); fn(spark) -> DataFrame
EXTRA_AUDIT = {
    "stats_rollup tier (non-registry)": (
        _stats_tier,
        [
            ("NO Python in plan (primitive moment sums)", "NO_PYTHON"),
            ("exactly one exchange (the bucket agg)", "EXCHANGES_1"),
            ("map-side partial aggregation before the exchange", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
            ("no join operator anywhere", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
        ],
    ),
    "histogram_rollup tier (non-registry)": (
        _histogram_tier,
        [
            ("NO Python in plan (sum(when) bin counters)", "NO_PYTHON"),
            ("exactly one exchange (counters shuffle, rows never do)", "EXCHANGES_1"),
            ("map-side partial aggregation before the exchange", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
            ("no join operator anywhere", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
        ],
    ),
    "counter_rollup tier (non-registry)": (
        _counter_tier,
        [
            ("NO Python in plan (JVM higher-order fold)", "NO_PYTHON"),
            ("2 exchanges: raw agg + tier-row boundary window", "EXCHANGES_2"),
            ("no join operator anywhere", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
        ],
    ),
    "bucketed-store kernel (non-registry)": (
        _bucketed_kernel,
        [
            ("scan → kernel with ZERO exchanges", r"(?s)^(?!.*Exchange)"),
            ("Arrow kernel (MapInPandas)", r"MapInPandas"),
            ("scan is bucketed (clustering came from storage)", r"Bucketed: true"),
        ],
    ),
    "ingest dedup_points (non-registry)": (
        _ingest_dedup,
        [
            ("pure-primitive HashAggregate", r"HashAggregate"),
            ("no SortAggregate fallback", r"(?s)^(?!.*SortAggregate)"),
            ("map-side partial aggregation before the exchange", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
        ],
    ),
    "funnel_reach (non-registry)": (
        lambda spark: __import__(
            "series_correction_project_updated_spark.operators.funnel", fromlist=["funnel_reach"]
        ).funnel_reach(
            spark.read.parquet(f"{SF}/events.parquet"), ["view", "click", "purchase"]
        ),
        [
            ("NO Python in plan (JVM aggregate fold)", "NO_PYTHON"),
            ("exactly one exchange (no k self-joins)", "EXCHANGES_1"),
            ("no join operator anywhere", r"(?s)^(?!.*(SortMergeJoin|BroadcastHashJoin|CartesianProduct))"),
        ],
    ),
    "session_stats (non-registry)": (
        lambda spark: __import__(
            "series_correction_project_updated_spark.operators.sessionize", fromlist=["session_stats"]
        ).session_stats(spark.read.parquet(f"{SF}/events.parquet")),
        [
            ("NO Python in plan (native session_window aggregate)", "NO_PYTHON"),
            ("exactly one exchange (key shuffle only)", "EXCHANGES_1"),
            # formatted explain prints the window node as "(N) Window" —
            # match the node header, not the class name (WindowExec never
            # appears), or the check can't fail
            ("no per-event Window operator (sessions merge inside the agg)", r"(?s)^(?!.*\(\d+\) Window\b)"),
        ],
    ),
    "read_range (compressed store, non-registry)": (
        _read_range_pruned,
        [
            ("chunk-stat time filter pushed to the parquet scan", r"PushedFilters: \[[^\]]*(t_max|t_min)"),
            ("decode UDF present downstream (MapInPandas)", r"MapInPandas"),
            ("scan -> decode is shuffle-free (no Exchange)", r"(?s)^(?!.*Exchange)"),
        ],
    ),
    "bottom_k_sample (non-registry)": (
        lambda spark: __import__(
            "series_correction_project_updated_spark.operators.sampling", fromlist=["bottom_k_sample"]
        ).bottom_k_sample(
            spark.read.parquet(f"{SF}/events.parquet"), 100, "user_id", ["user_id", "ts"]
        ),
        [
            ("NO Python in plan (hash-ordered row_number)", "NO_PYTHON"),
            ("exactly one exchange (the key shuffle)", "EXCHANGES_1"),
            (
                "PARTIAL per-task top-k BELOW the exchange (WindowGroupLimit rewrite)",
                r"WindowGroupLimit[\s\S]*Exchange[\s\S]*WindowGroupLimit[\s\S]*Partial",
            ),
        ],
    ),
    "refresh_tier (pruned, non-registry)": (
        _refresh_tier_pruned,
        [
            ("touched-day partition filter reaches the scan", r"PartitionFilters: \[[^\]]*bucket_date"),
            ("invalidation semi-join broadcasts (store never shuffles on it)", r"BroadcastHashJoin[^\n]*LeftSemi"),
            ("splice anti-join broadcasts (tier never shuffles on it)", r"BroadcastHashJoin[^\n]*LeftAnti"),
            ("no sort-merge join / no cartesian anywhere", r"(?s)^(?!.*(SortMergeJoin|CartesianProduct))"),
        ],
    ),
}


def main() -> None:
    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan audit (generated by docs/gen_plans.py)",
        "",
        "`.explain(formatted)` evidence, per headline query, that the plans are",
        "the ones designed for at 100 TB: pushdown, pruning, broadcasts, one",
        "shuffle for the kernel, whole-stage codegen on native paths.",
        "",
    ]
    items = [
        # retired registry slots (e.g. q03_top_orders) stay plan-audited
        # via their still-defined module-level functions
        (
            n,
            (
                lambda s, fn=resolve_query(n): fn(s, SF)
            ),
            c,
        )
        for n, c in AUDIT.items()
    ]
    items += [(n, fn, c) for n, (fn, c) in EXTRA_AUDIT.items()]
    for name, build, checks in items:
        df = build(spark)
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        plan = qe.explainString(mode.fromString("formatted"))
        # codegen subtrees only materialize under AQE at runtime; plan the
        # same query with AQE off to count them statically
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        cg = build(spark)._jdf.queryExecution().explainString(mode.fromString("codegen"))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        out.append(f"## {name}")
        out.append("")
        for label, pat in checks:
            if pat is None or (isinstance(pat, str) and pat.startswith("EXCHANGES_")):
                n_ex = len(re.findall(r"^\s*[+\-:* ]*Exchange\b", plan, re.M))
                want = 1 if pat is None else int(pat.rsplit("_", 1)[1])
                ok = n_ex == want
                out.append(f"- {'✓' if ok else '✗'} {label} (Exchange count = {n_ex})")
            elif isinstance(pat, str) and pat.startswith("SCANS_"):
                n_sc = len(re.findall(r"^\s*[+\-:* ]*Scan (parquet|ExistingRDD)", plan, re.M))
                ok = n_sc == int(pat.rsplit("_", 1)[1])
                out.append(f"- {'✓' if ok else '✗'} {label} (scan count = {n_sc})")
            elif pat == "WIN_EXPRS_4":
                win = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
                n_we = (win[0].count("last(") + win[0].count("first(")) if win else -1
                ok = n_we == 4
                out.append(f"- {'✓' if ok else '✗'} {label} (window exprs = {n_we})")
            elif pat == "NO_PYTHON":
                ok = re.search(PYTHON_NODES, plan) is None
                out.append(f"- {'✓' if ok else '✗'} {label}")
            elif pat == "CODEGEN":
                m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
                ok = m is not None and int(m.group(1)) >= 1
                n = m.group(1) if m else 0
                out.append(f"- {'✓' if ok else '✗'} {label} ({n} WholeStageCodegen subtrees)")
            else:
                ok = re.search(pat, plan) is not None
                out.append(f"- {'✓' if ok else '✗'} {label}")
        # keep the scan + join lines as evidence
        keep = [
            ln.strip()
            for ln in plan.splitlines()
            if re.search(r"PushedFilters|ReadSchema|BroadcastHashJoin|MapInPandas|Exchange|TakeOrdered", ln)
        ][:10]
        out.append("")
        out.append("```")
        out.extend(keep)
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    bad = sum(1 for ln in out if ln.startswith("- ✗"))
    print(f"wrote {path}; failed checks: {bad}")
    spark.stop()


if __name__ == "__main__":
    main()
