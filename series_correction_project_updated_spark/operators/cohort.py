"""Cohort retention: of users first seen on day D, how many were active
D+1, D+7, D+30 later? The standard companion to funnels and sessions.

Spark-first shape, three hash aggregates and one key-clustered join:

1. collapse raw events to distinct (user, day) pairs FIRST — at 10^12
   events this is the big reduction (hash agg with map-side partials;
   everything after runs on user-days, not events),
2. first-seen day per user (hash agg on the same clustering),
3. join user-days to first-seen on user_id (both sides hash-clustered by
   the join key — co-partitioned shuffle, no broadcast needed and no
   skew beyond a user's own day count, which is ≤ horizon days),
4. grid aggregate: (cohort_day, day_offset) → active users; plain
   ``count`` is EXACT here because step 1 already deduplicated
   (user, day) — no countDistinct buffer needed.

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
    user_days = events.select(F.col(key_col).alias("u"), day.alias("d")).distinct()
    first_seen = user_days.groupBy("u").agg(F.min("d").alias("cohort_day"))
    grid = (
        user_days.join(first_seen, "u")
        .select("cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active"))
    )
    if max_offset_days is not None:
        grid = grid.filter(F.col("day_offset") <= max_offset_days)
    size = first_seen.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        grid.join(size, "cohort_day")
        .withColumn("retention", F.col("active") / F.col("cohort_size"))
        .select("cohort_day", "day_offset", "active", "cohort_size", "retention")
    )
