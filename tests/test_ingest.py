"""Point-store ingest: dedup_points / upsert_points contract tests.

The store invariant everything downstream assumes — ``(series_key, t)``
unique — is enforced exactly here, so these tests pin (a) winner
determinism under every schema shape, (b) the hash-aggregable fast path
on the bare 3-column schema, (c) last-write-wins upsert semantics
including the partition-pruned variant, and (d) idempotence.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.ingest import dedup_points, upsert_points


def _bare(spark, rows):
    return spark.createDataFrame(rows, "series_key string, t long, value double")


def test_dedup_bare_schema_max_value_wins_and_hash_aggregates(spark):
    batch = _bare(
        spark,
        [("a", 1, 5.0), ("a", 1, 9.0), ("a", 2, 1.0), ("b", 1, 3.0), ("a", 1, 7.0)],
    )
    out = dedup_points(batch)
    got = {(r.series_key, r.t): r.value for r in out.collect()}
    assert got == {("a", 1): 9.0, ("a", 2): 1.0, ("b", 1): 3.0}
    # the bare shape must plan as HashAggregate (map-side partials), never
    # the SortAggregate the struct max_by fallback forces
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_dedup_version_col_highest_version_wins(spark):
    batch = spark.createDataFrame(
        [
            ("a", 1, 5.0, 1, "first"),
            ("a", 1, 3.0, 3, "third"),
            ("a", 1, 9.0, 2, "second"),
        ],
        "series_key string, t long, value double, fetch_seq int, tag string",
    )
    out = dedup_points(batch, version_col="fetch_seq")
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # the whole winning ROW is carried, not a column-wise mix
    assert (r.value, r.fetch_seq, r.tag) == (3.0, 3, "third")
    assert set(out.columns) == {"series_key", "t", "value", "fetch_seq", "tag"}


def test_dedup_wide_schema_value_winner_carries_row(spark):
    batch = spark.createDataFrame(
        [("a", 1, 5.0, "lo"), ("a", 1, 9.0, "hi"), ("b", 2, 1.0, "only")],
        "series_key string, t long, value double, tag string",
    )
    out = dedup_points(batch)
    got = {(r.series_key, r.t): (r.value, r.tag) for r in out.collect()}
    assert got == {("a", 1): (9.0, "hi"), ("b", 2): (1.0, "only")}


def test_dedup_version_ties_broken_by_remaining_columns(spark):
    # two rows tie on version; the ordering struct extends to the other
    # columns, so the winner is a deterministic function of row content
    batch = spark.createDataFrame(
        [("a", 1, 2.0, 7, "x"), ("a", 1, 8.0, 7, "x")],
        "series_key string, t long, value double, v int, tag string",
    )
    out1 = dedup_points(batch, version_col="v").collect()
    out2 = dedup_points(batch, version_col="v").collect()
    assert out1 == out2
    assert out1[0].value == 8.0  # value is the first tiebreaker after v


def test_upsert_last_write_wins(spark):
    store = _bare(spark, [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0)])
    batch = _bare(spark, [("a", 2, 20.0), ("c", 1, 30.0), ("a", 2, 25.0)])
    out = upsert_points(store, batch)
    got = {(r.series_key, r.t): r.value for r in out.collect()}
    assert got == {
        ("a", 1): 1.0,
        ("a", 2): 25.0,  # batch replaced store; batch-internal dup collapsed
        ("b", 1): 3.0,
        ("c", 1): 30.0,
    }
    # invariant: unique (key, t)
    assert out.count() == out.select("series_key", "t").distinct().count()


def test_upsert_idempotent(spark):
    store = _bare(spark, [("a", 1, 1.0), ("b", 1, 3.0)])
    batch = _bare(spark, [("a", 1, 10.0), ("c", 5, 7.0)])
    once = upsert_points(store, batch)
    twice = upsert_points(once, batch)
    assert sorted(once.collect()) == sorted(twice.collect())


def test_upsert_partition_pruned_matches_unpruned(spark, tmp_path):
    from series_correction_project_updated_spark.operators.refresh import write_points_partitioned

    # store spans 3 UTC days; batch touches only day 1
    day = 86400
    store_rows = [
        ("a", 10, 1.0),
        ("a", day + 10, 2.0),
        ("a", 2 * day + 10, 3.0),
        ("b", day + 20, 4.0),
    ]
    store = _bare(spark, store_rows)
    path = str(tmp_path / "store")
    write_points_partitioned(store, path)
    stored = spark.read.parquet(path)

    batch = _bare(spark, [("a", day + 10, 20.0), ("b", day + 30, 5.0)])
    pruned = upsert_points(stored, batch, prune_partition_col="bucket_date")
    plain = upsert_points(store, batch)

    got = {(r.series_key, r.t): r.value for r in pruned.collect()}
    want = {(r.series_key, r.t): r.value for r in plain.collect()}
    assert got == want
    assert got[("a", day + 10)] == 20.0
    assert got[("a", 10)] == 1.0  # untouched day passed through
    # derived layout column matches the store's own day arithmetic
    dates = {r.bucket_date for r in pruned.select("bucket_date").distinct().collect()}
    assert len(dates) == 3


def test_upsert_null_time_batch_row_cannot_wipe_untouched_days(spark, tmp_path):
    """Regression: a null-t batch row put None into the touched-dates
    list; isin([..., None]) is NULL for every non-match, so BOTH union
    legs dropped all untouched-day store rows — silent data loss."""
    from series_correction_project_updated_spark.operators.refresh import write_points_partitioned

    day = 86400
    store = _bare(spark, [("a", 10, 1.0), ("a", day + 10, 2.0), ("a", 2 * day + 10, 3.0)])
    path = str(tmp_path / "store_null")
    write_points_partitioned(store, path)
    stored = spark.read.parquet(path)

    batch = spark.createDataFrame(
        [("a", day + 10, 20.0), ("z", None, 9.0)],
        "series_key string, t long, value double",
    )
    out = upsert_points(stored, batch, prune_partition_col="bucket_date")
    got = {(r.series_key, r.t): r.value for r in out.collect()}
    assert got[("a", 10)] == 1.0  # untouched day survived
    assert got[("a", 2 * day + 10)] == 3.0
    assert got[("a", day + 10)] == 20.0
    assert got[("z", None)] == 9.0  # contract-violating row unions through
    assert len(got) == 4


def test_upsert_prune_only_antijoins_touched_days(spark, tmp_path):
    """The untouched-day leg must reach the output without entering the
    anti-join: assert via the plan that exactly one join is present and
    the union has a filter-only branch."""
    from series_correction_project_updated_spark.operators.refresh import write_points_partitioned

    day = 86400
    store = _bare(spark, [("a", 10, 1.0), ("a", day + 10, 2.0)])
    path = str(tmp_path / "store2")
    write_points_partitioned(store, path)
    stored = spark.read.parquet(path)
    batch = _bare(spark, [("a", day + 10, 9.0)])
    out = upsert_points(stored, batch, prune_partition_col="bucket_date")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join LeftAnti") == 1
