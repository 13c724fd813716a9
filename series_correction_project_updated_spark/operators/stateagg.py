"""Time-in-state tiers (TimescaleDB ``state_agg`` semantics): how long
each series spent in each categorical state, per bucket, exactly
additive across tiers.

The categorical sibling of ``timeweight``: a state OBSERVATION holds
until the next observation (LOCF — states don't interpolate), each
[t0, t1) segment carries ``state(t0)``, and segments SPLIT at every
bucket edge they cross, so every covered instant lands in exactly one
(key, bucket, state) cell and the cascade is a plain SUM:

    state_cascade(state_rollup(raw, "1m"), "1h") == state_rollup(raw, "1h")

(test-pinned, no envelopes — the boundary rule only splits time, like
timeweight and unlike counters). Use it for "how long was this page in
'rewrite' churn per day" (drift classes ARE states — composition
test-pinned), device up/down time, crawl-health dashboards.

Tier row: (key, bucket_start, state, duration_sec). Serving helpers:
``dominant_state`` (max_by over stored rows — the bucket's label) and
the trivial ``WHERE state = X`` filter for time-in-state.

Execution shape — identical to timeweight's, ONE shuffle total: the
lag window clusters by key; the edge explode is narrow (bounded by
buckets spanned, ``max_gap_sec`` bounds pathological dark segments);
the final (key, bucket, state) aggregate reuses the window's
hashpartitioning(key) so the groupBy adds no exchange of its own.
Pure JVM end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import TIER_SECONDS

__all__ = ["state_rollup", "state_cascade", "dominant_state"]


def state_rollup(
    points: DataFrame,
    tier: str = "1m",
    max_gap_sec: float | None = None,
    key_col: str = "series_key",
    time_col: str = "t",
    state_col: str = "state",
) -> DataFrame:
    """Per-(key, bucket, state): ``duration_sec``. The last observation
    of a series emits nothing (its state's extent is unknown until a
    next observation closes it — the same open-segment rule as
    ``timeweight``); ``max_gap_sec`` drops segments longer than the
    threshold so a series that went dark doesn't smear its last state
    across the outage."""
    sec = TIER_SECONDS[tier]
    # state as tiebreaker: under duplicate timestamps the zero-width first
    # row drops (the `_t1 > _t0` filter) and the LAST state by string order
    # owns the segment — deterministic at any parallelism, and the same
    # (t, state) order the streaming twin sorts by
    w = Window.partitionBy(key_col).orderBy(time_col, state_col)
    t0 = F.col(time_col).cast("timestamp_ltz").cast("double")
    s = F.col(state_col).cast("string")
    seg = (
        points.where(s.isNotNull())
        .select(
            F.col(key_col),
            t0.alias("_t0"),
            s.alias("_s"),
            F.lead(t0).over(w).alias("_t1"),
        )
        .where(F.col("_t1").isNotNull() & (F.col("_t1") > F.col("_t0")))
    )
    if max_gap_sec is not None:
        seg = seg.where(F.col("_t1") - F.col("_t0") <= max_gap_sec)

    edges = F.sequence(
        (F.floor(F.col("_t0") / sec) * sec).cast("long"),
        (F.floor(F.col("_t1") / sec) * sec).cast("long"),
        F.lit(sec),
    )
    pieces = F.transform(
        edges,
        lambda e: F.struct(
            e.alias("bucket_start"),
            (
                F.least(F.col("_t1"), (e + sec).cast("double"))
                - F.greatest(F.col("_t0"), e.cast("double"))
            ).alias("dur"),
        ),
    )
    ex = seg.select(key_col, "_s", F.explode(pieces).alias("p"))
    return (
        ex.where(F.col("p.dur") > 0)
        .groupBy(
            F.col(key_col),
            F.col("p.bucket_start").alias("bucket_start"),
            F.col("_s").alias("state"),
        )
        .agg(F.sum("p.dur").alias("duration_sec"))
    )


def state_cascade(
    fine: DataFrame,
    to_tier: str,
    key_col: str = "series_key",
) -> DataFrame:
    """Plain additive merge — exactly equals the direct rollup (every
    covered instant belongs to exactly one fine (bucket, state) cell)."""
    sec = TIER_SECONDS[to_tier]
    return fine.groupBy(
        F.col(key_col),
        ((F.floor(F.col("bucket_start") / sec) * sec).cast("long")).alias(
            "bucket_start"
        ),
        "state",
    ).agg(F.sum("duration_sec").alias("duration_sec"))


def dominant_state(tier: DataFrame, key_col: str = "series_key") -> DataFrame:
    """The bucket's label: state with the longest duration (ties broken
    by state string for determinism), plus its share of covered time."""
    return tier.groupBy(key_col, "bucket_start").agg(
        F.max_by(
            "state", F.struct(F.col("duration_sec"), F.col("state"))
        ).alias("state"),
        (
            F.max("duration_sec") / F.sum("duration_sec")
        ).alias("share"),
        F.sum("duration_sec").alias("covered_sec"),
    )
