"""Cohort retention vs DuckDB oracle; rolling sketch distincts vs exact."""

import duckdb
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.cohort import cohort_retention
from series_correction_project_updated_spark.operators.distinct import (
    distinct_rollup,
    rolling_distinct,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_cohort_retention_matches_duckdb(spark, events):
    got = sorted(
        (r.cohort_day, r.day_offset, r.active, r.cohort_size, round(r.retention, 9))
        for r in cohort_retention(events).collect()
    )
    con = duckdb.connect()
    con.execute(f"create view events as select * from read_parquet('{SF}/events.parquet')")
    want = sorted(
        (cd, off, a, cs, round(a / cs, 9))
        for cd, off, a, cs in con.execute(
            """
            with ud as (
              select distinct user_id u, cast(floor(epoch(ts)/86400) as bigint) d
              from events
            ), fs as (
              select u, min(d) cohort_day from ud group by u
            ), grid as (
              select cohort_day, (d - cohort_day) day_offset, count(*) active
              from ud join fs using (u) group by 1, 2
            ), size as (
              select cohort_day, count(*) cohort_size from fs group by 1
            )
            select cohort_day, day_offset, active, cohort_size
            from grid join size using (cohort_day)
            """
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0
    # day-0 retention is 1.0 for every cohort by construction
    assert all(r[4] == 1.0 for r in got if r[1] == 0)


def test_cohort_offset_truncation(spark, events):
    full = cohort_retention(events)
    trunc = cohort_retention(events, max_offset_days=3)
    assert trunc.filter(F.col("day_offset") > 3).count() == 0
    a = sorted(map(tuple, trunc.collect()))
    b = sorted(map(tuple, full.filter(F.col("day_offset") <= 3).collect()))
    assert a == b


def test_rolling_wau_exact_vs_raw(spark, events):
    """7-day rolling distinct from DAILY SKETCHES must equal the exact
    7-day countDistinct recomputed from raw for every day (sparse-mode
    exactness)."""
    daily = distinct_rollup(events, "1d")
    wau = {
        r.bucket_start: r.rolling_distinct
        for r in rolling_distinct(daily, buckets=7, tier="1d").collect()
    }
    days = sorted(wau)
    epoch_day = F.floor(F.col("ts").cast("timestamp_ltz").cast("double") / 86400).cast(
        "long"
    )
    ud = events.select(F.col("user_id").alias("u"), epoch_day.alias("d")).distinct().cache()
    for b in days:
        d = b // 86400
        exact = (
            ud.filter((F.col("d") >= d - 6) & (F.col("d") <= d))
            .select("u")
            .distinct()
            .count()
        )
        assert wau[b] == exact, (b, wau[b], exact)


def test_rolling_keyed_variant(spark, events):
    daily = distinct_rollup(events, "1d", key_col="event_type")
    out = rolling_distinct(daily, buckets=7, tier="1d", key_col="event_type")
    assert out.filter(F.col("rolling_distinct") < F.col("approx_distinct")).count() == 0
    assert out.select("event_type").distinct().count() == 5
