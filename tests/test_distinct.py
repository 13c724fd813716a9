"""HLL distinct tiers: cascade law, accuracy, exactness at small cardinality."""

import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.distinct import (
    distinct_cascade,
    distinct_rollup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_cascade_equals_direct_rollup(spark, events):
    """The law the module exists for: merging 1m sketches up to 1h gives
    the same estimates as rolling 1h straight from raw (HLL union
    associativity) — and at these per-bucket cardinalities HLL runs in
    sparse mode, where estimates are EXACT, so equality against the true
    countDistinct is also pinned per bucket. (Serialized sketch bytes
    can differ between the two paths — sparse-mode serialization is
    insertion-ordered — so estimate identity is the right invariant.)"""
    fine = distinct_rollup(events, "1m")
    via_cascade = distinct_cascade(fine, "1h")
    direct = distinct_rollup(events, "1h")
    a = sorted((r.bucket_start, r.approx_distinct) for r in via_cascade.collect())
    b = sorted((r.bucket_start, r.approx_distinct) for r in direct.collect())
    assert a == b
    assert len(a) > 0
    exact = sorted(
        (r.bucket_start, r.n)
        for r in events.groupBy(
            (F.floor(F.col("ts").cast("timestamp_ltz").cast("double") / 3600) * 3600)
            .cast("long")
            .alias("bucket_start")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    assert a == exact


def test_estimates_within_hll_error_vs_exact(spark, events):
    est = {
        r.bucket_start: r.approx_distinct
        for r in distinct_rollup(events, "1d").collect()
    }
    exact = {
        r.bucket_start: r.n
        for r in events.groupBy(
            (F.floor(F.col("ts").cast("timestamp_ltz").cast("double") / 86400) * 86400)
            .cast("long")
            .alias("bucket_start")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def test_small_cardinality_is_exact(spark):
    """HLL in sparse mode is exact for small sets — per-bucket distincts
    of a handful of users must come out exact, not approximate."""
    rows = [(u, 100.0 * u + b) for u in range(5) for b in range(3)]
    df = spark.createDataFrame(rows, "user_id long, t double").select(
        "user_id", F.timestamp_seconds("t").alias("ts")
    )
    out = distinct_rollup(df, "1d")
    assert out.count() == 1
    assert out.collect()[0].approx_distinct == 5


def test_distinct_tier_streams_with_watermark(spark, events, tmp_path):
    """hll_sketch_agg is a TypedImperativeAggregate and runs inside a
    watermarked streaming aggregation — the live distinct tier. Closed
    1h buckets must estimate identically to the batch tier."""
    src = str(tmp_path / "src")
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"))
        .select(
            F.unix_timestamp("window.start").alias("bucket_start"),
            F.hll_sketch_estimate("sketch").alias("approx_distinct"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("distinct_sink")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.bucket_start: r.approx_distinct for r in spark.table("distinct_sink").collect()
    }
    batch = {
        r.bucket_start: r.approx_distinct for r in distinct_rollup(ev, "1h").collect()
    }
    assert len(got) > 0
    for k, v in got.items():  # emitted (closed) buckets match batch exactly
        assert batch[k] == v


def test_keyed_variant_and_plan(spark, events):
    keyed = distinct_rollup(events, "1h", key_col="event_type")
    assert keyed.filter(F.col("approx_distinct") <= 0).count() == 0
    assert keyed.select("event_type").distinct().count() == 5
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    import re

    # one hash agg exchange, map-side partial sketch merge, no Python
    assert len(re.findall(r"^\s*[+\-:* ]*Exchange\b", plan, re.M)) == 1
    assert "Python" not in plan
    assert "ObjectHashAggregate" in plan or "HashAggregate" in plan
