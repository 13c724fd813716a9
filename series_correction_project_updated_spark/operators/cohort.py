"""Cohort retention: of users first seen on day D, how many were active
D+1, D+7, D+30 later? The standard companion to funnels and sessions.

Spark-first shape — ONE wide shuffle, no join:

1. ``collect_set(day)`` per user — a single hash shuffle on user_id;
   map-side partial collect_sets dedup (user, day) before the exchange,
   so at 10^12 events only distinct user-days cross the wire, and the
   per-user state is bounded by the horizon in days (≤ thousands),
2. ``array_min`` gives first-seen and ``explode`` re-emits the user's
   days as (cohort_day, day_offset) rows — pure JVM, no second pass over
   raw data, no join back (the naive distinct→first-seen→join plan costs
   three shuffles because ``distinct`` clusters on (user, day), not
   user),
3. grid aggregate: (cohort_day, day_offset) → active users; plain
   ``count`` is EXACT because step 1 already deduplicated — no
   countDistinct buffer.

``retention`` divides by cohort size (day-0 users). Day 0 is always
present with retention 1.0 by construction.

Oracle: the whole thing is ANSI-SQL (tests run the same query in DuckDB
and hash-compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """(cohort_day, day_offset, active, cohort_size, retention) rows.

    ``cohort_day`` is the UTC epoch-day index of the user's first event;
    ``day_offset`` counts days since it. ``max_offset_days`` truncates
    the grid (reporting horizon).
    """
    day = F.floor(F.col(ts_col).cast("timestamp_ltz").cast("double") / 86400).cast("long")
    per_user = (
        events.select(F.col(key_col).alias("u"), day.alias("d"))
        .groupBy("u")
        .agg(F.collect_set("d").alias("ds"))
        .select(F.array_min("ds").alias("cohort_day"), F.col("ds"))
    )
    grid = (
        per_user.select("cohort_day", F.explode("ds").alias("d"))
        .select("cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active"))
    )
    if max_offset_days is not None:
        grid = grid.filter(F.col("day_offset") <= max_offset_days)
    size = per_user.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        grid.join(size, "cohort_day")
        .withColumn("retention", F.col("active") / F.col("cohort_size"))
        .select("cohort_day", "day_offset", "active", "cohort_size", "retention")
    )
