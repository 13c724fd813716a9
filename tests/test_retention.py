"""Retention/expiry layer: logical policy filter + physical partition drop."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.retention import (
    DEFAULT_POLICY,
    apply_retention,
    expire_partition_dirs,
    retention_cascade,
    retention_cutoff,
    write_tier_partitioned,
)
from series_correction_project_updated_spark.operators.rollup import rollup_all_tiers
from series_correction_project_updated_spark.sources.synth import (
    generate_pages,
    pages_to_series,
)


@pytest.fixture(scope="module")
def tiers(spark):
    pts = pages_to_series(generate_pages(spark, n_urls=8, samples_per_url=400, interval_sec=3600))
    return rollup_all_tiers(pts)


def test_apply_retention_filters_and_is_nontrivial(tiers):
    tier = tiers["1h"]
    total = tier.count()
    keep = 5 * 86400.0
    kept = apply_retention(tier, keep)
    n = kept.count()
    assert 0 < n < total, (n, total)
    cutoff = retention_cutoff(tier, keep)
    assert kept.agg(F.min("bucket_start")).collect()[0][0] >= cutoff
    # keep=None → identity
    assert apply_retention(tier, None).count() == total


def test_retention_cascade_applies_policy_per_tier(tiers):
    out = retention_cascade(tiers, {"1m": 2 * 86400.0, "1h": 5 * 86400.0, "1d": None})
    assert out["1d"].count() == tiers["1d"].count()
    assert out["1m"].count() < tiers["1m"].count()
    assert out["1h"].count() < tiers["1h"].count()
    assert set(out) == set(tiers)
    assert set(DEFAULT_POLICY) == {"1m", "1h", "1d"}


def test_expire_partition_dirs_drops_only_whole_days(tiers, tmp_path):
    tier = tiers["1d"]
    path = str(tmp_path / "tier_1d")
    write_tier_partitioned(tier, path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("bucket_date="))
    assert len(dirs) > 3
    # cutoff mid-way through the third day: days 1-2 fully expired, day 3
    # straddles and must survive
    days = [d.split("=", 1)[1] for d in dirs]
    cutoff = pd.Timestamp(days[2], tz="UTC").timestamp() + 3600.0
    removed = expire_partition_dirs(path, cutoff)
    assert removed == dirs[:2]
    remaining = sorted(d for d in os.listdir(path) if d.startswith("bucket_date="))
    assert remaining == dirs[2:]
    # idempotent
    assert expire_partition_dirs(path, cutoff) == []
    # surviving data still reads, and logical retention prunes the straddler's dead rows
    import pyspark.sql

    spark = tier.sparkSession
    back = spark.read.parquet(path)
    assert back.count() == tier.where(
        F.to_date(F.timestamp_seconds(F.col("bucket_start"))).cast("string").isin(days[2:])
    ).count()


def test_retention_on_compressed_store(tiers):
    """The same policy applies to the COMPRESSED chunk store via
    time_col='chunk_start' — whole chunks expire together."""
    from series_correction_project_updated_spark.operators.compress import compress_rollup

    comp = compress_rollup(tiers["1m"], "1m")
    total = comp.count()
    kept = apply_retention(comp, 4 * 86400.0, time_col="chunk_start")
    n = kept.count()
    assert 0 < n <= total
    cutoff = retention_cutoff(comp, 4 * 86400.0, time_col="chunk_start")
    assert kept.agg(F.min("chunk_start")).collect()[0][0] >= cutoff


def test_expire_partition_dirs_via_hadoop_fs(tiers, tmp_path):
    """r3 verdict #3: expiry through the Hadoop FileSystem API on a
    ``file:`` URI — the same path-resolution object stores use — must
    drop exactly the whole-day-expired partitions, idempotently."""
    tier = tiers["1d"]
    spark = tier.sparkSession
    local = str(tmp_path / "tier_fs")
    write_tier_partitioned(tier, local)
    uri = "file://" + local
    from series_correction_project_updated_spark.operators.retention import list_partition_dirs

    dirs = list_partition_dirs(uri, spark=spark)
    assert dirs == sorted(d for d in os.listdir(local) if d.startswith("bucket_date="))
    assert len(dirs) > 3
    days = [d.split("=", 1)[1] for d in dirs]
    cutoff = pd.Timestamp(days[2], tz="UTC").timestamp() + 3600.0
    removed = expire_partition_dirs(uri, cutoff, spark=spark)
    assert removed == dirs[:2]
    assert list_partition_dirs(uri, spark=spark) == dirs[2:]
    assert expire_partition_dirs(uri, cutoff, spark=spark) == []  # idempotent
    # survivors still read through the same URI
    assert spark.read.parquet(uri).count() > 0


def test_retention_job_survives_total_expiry(tmp_path, spark):
    """jobs/run_retention must report rows_within_horizon=0 (not crash on
    an unreadable empty store) when the policy expires every partition
    (r3 ADVICE)."""
    import json
    import subprocess
    import sys

    pts = pages_to_series(generate_pages(spark, n_urls=2, samples_per_url=50, interval_sec=86400))
    tier = rollup_all_tiers(pts)["1d"]
    path = str(tmp_path / "tier_doomed")
    write_tier_partitioned(tier, path)
    max_ts = tier.agg(F.max("bucket_start")).collect()[0][0]
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "jobs", "run_retention.py"),
         "--tier-dir", path, "--keep-days", "1", "--now", str(max_ts + 400 * 86400.0)],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["rows_within_horizon"] == 0
    assert len(report["partitions_dropped"]) > 0


def test_compressed_store_expiry_is_conservative(tiers):
    """With span_seconds = chunk span, a chunk is kept until its ENTIRE
    span leaves the horizon — dropping on raw chunk_start would delete up
    to a chunk span of in-horizon points (r4 self-review)."""
    from series_correction_project_updated_spark.operators.compress import (
        compress_rollup,
        decompress_to_points,
    )

    chunk_buckets = 64
    span = 60.0 * chunk_buckets
    comp = compress_rollup(tiers["1m"], "1m", chunk_buckets=chunk_buckets)
    keep = 4 * 86400.0
    cutoff = retention_cutoff(comp, keep, time_col="chunk_start")
    kept = apply_retention(comp, keep, time_col="chunk_start", span_seconds=span)
    naive = apply_retention(comp, keep, time_col="chunk_start")
    assert kept.count() >= naive.count()
    # every decoded point within the horizon must survive the chunk filter
    pts_all = decompress_to_points(comp).where(F.col("bucket_start") >= cutoff)
    pts_kept = decompress_to_points(kept).where(F.col("bucket_start") >= cutoff)
    assert pts_kept.count() == pts_all.count()
    # and the filter still drops something (policy is non-trivial here)
    assert kept.count() < comp.count()
