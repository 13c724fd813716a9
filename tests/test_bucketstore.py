"""Bucketed point store: write-once shuffle, exchange-free kernel reads.

Pins the three claims sources/bucketstore.py makes:
1. the bucketed write emits exactly one file per bucket (repartition and
   the bucket spec share the partition-id function),
2. a kernel run over ``read_points_bucketed(...)`` with
   ``assume_clustered=True`` contains NO exchange and matches the
   shuffled-path output bit-exactly,
3. the read helper refuses a non-bucketed table (the contract that keeps
   a silent mis-clustering from corrupting per-series results).
"""

import glob
import os

import pytest

from series_correction_project_updated_spark.operators.correct import correct_series
from series_correction_project_updated_spark.sources.bucketstore import (
    read_points_bucketed,
    write_points_bucketed,
)
from series_correction_project_updated_spark.sources.synth import generate_pages, pages_to_series


@pytest.fixture(scope="module")
def points(spark):
    return pages_to_series(generate_pages(spark, n_urls=40, samples_per_url=120)).cache()


def test_bucketed_write_one_file_per_bucket(spark, points, tmp_path):
    path = str(tmp_path / "store")
    write_points_bucketed(points, "pts_files", buckets=8, path=path)
    files = [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    ]
    # one file per NON-EMPTY bucket (an empty bucket writes nothing): the
    # bucket id is the `_0000N` suffix — no id may appear twice, and the
    # naive tasksxbuckets blow-up would show >8 files
    bucket_ids = [os.path.basename(f).split("_")[1].split(".")[0] for f in files]
    assert len(bucket_ids) == len(set(bucket_ids))
    assert 0 < len(files) <= 8


def test_clustered_kernel_is_exchange_free_and_bit_exact(spark, points, tmp_path):
    path = str(tmp_path / "store2")
    write_points_bucketed(points, "pts_main", buckets=8, path=path)
    stored = read_points_bucketed(spark, "pts_main")

    clustered = correct_series(stored, assume_clustered=True)
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan -> kernel, zero shuffles
    assert "Scan" in plan

    shuffled = correct_series(points)
    a = sorted(map(tuple, clustered.collect()))
    b = sorted(map(tuple, shuffled.collect()))
    assert a == b  # bit-exact: clustering preserved every series whole


def test_read_rejects_unbucketed_table(spark, points, tmp_path):
    path = str(tmp_path / "plain")
    spark.sql("DROP TABLE IF EXISTS pts_plain")
    points.write.format("parquet").option("path", path).saveAsTable("pts_plain")
    with pytest.raises(ValueError, match="not bucketed"):
        read_points_bucketed(spark, "pts_plain")


def test_day_partitioned_bucketed_layout(spark, points, tmp_path):
    """The unified layout: bucket_date= partitions under key buckets.
    A day-windowed kernel run must (a) prune to the window's partitions,
    (b) still run exchange-free, (c) match the shuffled path on the same
    window bit-exactly."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "combo")
    write_points_bucketed(points, "pts_combo", buckets=8, path=path, partition_by_day=True)
    stored = read_points_bucketed(spark, "pts_combo")
    days = sorted(r[0] for r in stored.select("bucket_date").distinct().collect())
    assert len(days) > 2
    keep = days[: len(days) // 2]

    windowed = stored.filter(F.col("bucket_date").isin([str(d) for d in keep])).drop(
        "bucket_date"
    )
    clustered = correct_series(windowed, assume_clustered=True)
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # partition pruning reached the scan: only the kept days' files open
    import re

    files_read = {m for f in clustered.inputFiles() for m in re.findall(r"bucket_date=([0-9-]+)", f)}
    assert files_read and files_read <= {str(d) for d in keep}

    shuffled = correct_series(
        points.filter(
            F.date_from_unix_date(F.floor(F.col("t") / 86400).cast("int")).isin(
                [str(d) for d in keep]
            )
        )
    )
    a = sorted(map(tuple, clustered.collect()))
    b = sorted(map(tuple, shuffled.collect()))
    assert a == b


def test_single_series_lookup_prunes_to_one_bucket(spark, points, tmp_path):
    """The point-lookup serving path: an equality filter on the bucket key
    must scan ONE bucket's files, not the store (Catalyst bucket pruning —
    'SelectedBucketsCount: 1 out of N' on the scan node)."""
    path = str(tmp_path / "store_prune")
    write_points_bucketed(points, "pts_prune", buckets=8, path=path)
    stored = read_points_bucketed(spark, "pts_prune")
    key = points.select("series_key").first()[0]
    one = stored.filter(stored.series_key == key)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = one._jdf.queryExecution().explainString(mode.fromString("formatted"))
    assert "SelectedBucketsCount: 1 out of 8" in plan
    assert one.count() == points.filter(points.series_key == key).count()


def test_autobucketedscan_pinned_off(spark, points, tmp_path):
    """The footgun this module exists for: with autoBucketedScan left on,
    a mapInPandas plan (no required distribution) gets a REGULAR file
    scan and series straddle partitions. Verify the helper pins it off."""
    path = str(tmp_path / "store3")
    write_points_bucketed(points, "pts_scan", buckets=8, path=path)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    read_points_bucketed(spark, "pts_scan")
    assert spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled") == "false"
