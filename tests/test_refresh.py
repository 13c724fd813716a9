"""Incremental tier refresh (operators/refresh.py): invalidation-based
late-data absorption must EXACTLY reproduce the full recompute."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from series_correction_project_updated_spark.operators.correct import correct_series
from series_correction_project_updated_spark.operators.refresh import (
    invalidated_buckets,
    recorrect_series,
    refresh_cascade,
    refresh_tier,
)
from series_correction_project_updated_spark.operators.rollup import cascade, rollup
from series_correction_project_updated_spark.sources.synth import (
    generate_pages,
    pages_to_series,
)


@pytest.fixture(scope="module")
def split(spark):
    """(base, late, all) point sets: the late batch is every 7th row of
    three of the twelve series — out-of-order arrivals scattered through
    their series' history."""
    pts = pages_to_series(generate_pages(spark, n_urls=12, samples_per_url=120, seed=77))
    keys = [r[0] for r in pts.select("series_key").distinct().orderBy("series_key").limit(3).collect()]
    w = F.row_number().over(Window.partitionBy("series_key").orderBy("t"))
    numbered = pts.withColumn("rn", w)
    late = numbered.filter(F.col("series_key").isin(keys) & (F.col("rn") % 7 == 0)).drop("rn")
    base = numbered.withColumn(
        "is_late", F.col("series_key").isin(keys) & (F.col("rn") % 7 == 0)
    ).filter(~F.col("is_late")).drop("rn", "is_late")
    return base.cache(), late.cache(), pts.cache()


def _collect(df, float_cols=("vsum",)):
    rows = df.orderBy("series_key", "bucket_start").collect()
    exact = [
        tuple(r[c] for c in df.columns if c not in float_cols) for r in rows
    ]
    floats = np.array([[r[c] for c in float_cols] for r in rows])
    return exact, floats


def test_refresh_tier_equals_full_rollup(spark, split):
    base, late, allpts = split
    standing = rollup(base, "1m")
    refreshed = refresh_tier(standing, allpts, late, "1m")
    want = rollup(allpts, "1m")
    got_e, got_f = _collect(refreshed)
    want_e, want_f = _collect(want)
    assert got_e == want_e  # cnt/min/max/first/last + keys: exact
    np.testing.assert_allclose(got_f, want_f, rtol=1e-12)  # vsum: fp order


def test_refresh_recomputes_only_invalidated(spark, split):
    base, late, allpts = split
    inv = invalidated_buckets(late, "1m")
    n_inv = inv.count()
    n_total = rollup(allpts, "1m").count()
    assert 0 < n_inv < n_total / 4  # the late trickle touches a sliver
    # rows outside the invalidation set pass through untouched (same
    # object-level rows as the standing tier)
    standing = rollup(base, "1m")
    refreshed = refresh_tier(standing, allpts, late, "1m")
    kept_got = refreshed.join(inv, ["series_key", "bucket_start"], "left_anti")
    kept_want = standing.join(inv, ["series_key", "bucket_start"], "left_anti")
    assert kept_got.exceptAll(kept_want).count() == 0
    assert kept_want.exceptAll(kept_got).count() == 0


def test_refresh_empty_late_is_identity(spark, split):
    base, late, allpts = split
    standing = rollup(base, "1m")
    empty_late = late.limit(0)
    refreshed = refresh_tier(standing, base, empty_late, "1m")
    assert refreshed.exceptAll(standing).count() == 0
    assert standing.exceptAll(refreshed).count() == 0


def test_refresh_cascade_equals_full_cascade(spark, split):
    base, late, allpts = split
    standing_1m = rollup(base, "1m")
    standing_1h = cascade(standing_1m, "1h")
    refreshed_1m = refresh_tier(standing_1m, allpts, late, "1m").cache()
    inv = invalidated_buckets(late, "1m")
    got = refresh_cascade(refreshed_1m, standing_1h, inv, "1h")
    want = cascade(refreshed_1m, "1h")
    got_e, got_f = _collect(got)
    want_e, want_f = _collect(want)
    assert got_e == want_e
    np.testing.assert_allclose(got_f, want_f, rtol=1e-12)


def test_refresh_partition_pruned_equals_unpruned(spark, split, tmp_path):
    """Against an on-disk UTC-day-partitioned point store, the
    prune_partition_col path must (a) read strictly fewer partition
    directories than the store holds and (b) produce the identical
    refreshed tier."""
    from series_correction_project_updated_spark.operators.refresh import (
        write_points_partitioned,
    )

    _, _, allpts = split
    # a late batch confined to each touched series' FIRST day — the
    # realistic shape (late data clusters near one region, not uniformly
    # over history) and the one where date pruning has teeth
    t0 = allpts.agg(F.min("t")).collect()[0][0]
    keys = [
        r[0]
        for r in allpts.select("series_key").distinct().orderBy("series_key").limit(3).collect()
    ]
    late = allpts.filter(
        F.col("series_key").isin(keys) & (F.col("t") < t0 + 86400)
    ).sample(0.3, seed=5)
    store = str(tmp_path / "points")
    write_points_partitioned(allpts, store)
    disk = spark.read.parquet(store)

    n_days_store = disk.select("bucket_date").distinct().count()
    inv = invalidated_buckets(late, "1m")
    n_days_touched = inv.select(
        F.date_from_unix_date(F.floor(F.col("bucket_start") / 86400).cast("int"))
    ).distinct().count()
    assert n_days_touched < n_days_store  # pruning has something to prune

    standing = rollup(allpts.exceptAll(late), "1m")
    pruned = refresh_tier(
        standing, disk, late, "1m", prune_partition_col="bucket_date"
    )
    want = rollup(allpts, "1m")
    got_e, got_f = _collect(pruned)
    want_e, want_f = _collect(want)
    assert got_e == want_e
    np.testing.assert_allclose(got_f, want_f, rtol=1e-12)

    # the static isin filter actually prunes the file listing
    dates = [
        r[0]
        for r in inv.select(
            F.date_from_unix_date(
                F.floor(F.col("bucket_start") / 86400).cast("int")
            ).alias("d")
        ).distinct().collect()
    ]
    # (inputFiles() ignores pushed filters — count the files actually read)
    pruned_files = (
        disk.filter(F.col("bucket_date").isin(dates))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    all_files = disk.select(F.input_file_name()).distinct().count()
    assert 0 < pruned_files < all_files


def test_recorrect_series_equals_full_kernel(spark, split):
    base, late, allpts = split
    old = correct_series(base)
    got = (
        recorrect_series(allpts, late, old)
        .orderBy("series_key", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        correct_series(allpts)
        .orderBy("series_key", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_refresh_compressed_equals_full_recompress(spark, split, tmp_path):
    """Chunk-level refresh propagation: untouched chunks keep their
    standing payload BYTES, touched chunks re-encode, and the result is
    payload-byte-identical to compressing the refreshed tier from
    scratch. Tiers are materialized to parquet so both paths encode the
    exact same float bits (fp sum order varies between plan runs)."""
    from series_correction_project_updated_spark.operators.compress import (
        compress_rollup,
        refresh_compressed,
    )

    base, late, allpts = split
    chunk_buckets = 64

    rollup(base, "1m").write.parquet(str(tmp_path / "standing"))
    standing = spark.read.parquet(str(tmp_path / "standing"))
    refresh_tier(standing, allpts, late, "1m").write.parquet(str(tmp_path / "refreshed"))
    refreshed = spark.read.parquet(str(tmp_path / "refreshed"))

    store = compress_rollup(standing, "1m", chunk_buckets=chunk_buckets)
    inv = invalidated_buckets(late, "1m")
    got = (
        refresh_compressed(store, refreshed, inv, "1m", chunk_buckets=chunk_buckets)
        .orderBy("series_key", "chunk_start")
        .toPandas()
    )
    want = (
        compress_rollup(refreshed, "1m", chunk_buckets=chunk_buckets)
        .orderBy("series_key", "chunk_start")
        .toPandas()
    )
    assert list(got["series_key"]) == list(want["series_key"])
    assert list(got["chunk_start"]) == list(want["chunk_start"])
    assert list(got["n_points"]) == list(want["n_points"])
    assert list(got["t_min"]) == list(want["t_min"])
    assert list(got["t_max"]) == list(want["t_max"])
    assert all(bytes(a) == bytes(b) for a, b in zip(got["payload"], want["payload"]))

    # and it really is incremental: only chunks containing an invalidated
    # bucket were re-encoded
    chunk_span = 60 * chunk_buckets
    touched = inv.select(
        "series_key",
        (F.floor(F.col("bucket_start") / chunk_span) * chunk_span)
        .cast("long")
        .alias("chunk_start"),
    ).distinct()
    n_touched = touched.count()
    assert 0 < n_touched < len(want)
