"""Time-weighted averages over irregular samples (TimescaleDB
``time_weight`` semantics), as an exactly-additive tier.

A plain ``avg(value)`` over-weights burst periods when sampling is
irregular; the right mean integrates the interpolated signal over time.
Per adjacent-sample segment the integral is a trapezoid (``method=
'linear'``) or a step rectangle (``'locf'``); segments are SPLIT at
every bucket edge they cross (``sequence`` + ``transform`` + explode —
pure JVM), so every instant of covered time lands in exactly one
bucket and the tier is EXACTLY additive:

    tw_cascade(tw_rollup(raw, "1m"), "1h") == tw_rollup(raw, "1h")

with no envelope carrying at all — cascade is a plain sum of
(integral, covered_sec) (test-pinned; the counter tier needs envelopes
because ITS boundary rule looks at values, this one only splits time).
``twa = integral / covered_sec``; buckets a series never covers simply
have no row (run the kernel's gap-fill upstream for dense coverage).

``max_gap_sec`` drops segments longer than a threshold (a sensor that
went dark should not smear its last value across the outage — same
reasoning as TimescaleDB's gap handling); a pathological months-long
segment otherwise explodes into months/bucket_sec split rows.

Execution shape: ONE shuffle total — the lag window clusters by key,
the explode (bounded by buckets spanned) is narrow, and the final
aggregate's (key, bucket) clustering requirement is already satisfied
by the window's hashpartitioning(key), so the groupBy adds no exchange
of its own (plan-asserted, no Python anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import TIER_SECONDS


def time_weighted_rollup(
    points: DataFrame,
    tier: str = "1m",
    method: str = "linear",
    max_gap_sec: float | None = None,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, bucket): ``integral``, ``covered_sec``, ``twa``."""
    if method not in ("linear", "locf"):
        raise ValueError(f"method must be 'linear' or 'locf', got {method}")
    sec = TIER_SECONDS[tier]

    w = Window.partitionBy(key_col).orderBy(time_col)
    t0 = F.col(time_col).cast("timestamp_ltz").cast("double")
    v = F.col(value_col).cast("double")
    seg = (
        points.where(v.isNotNull())
        .select(
            F.col(key_col),
            t0.alias("_t0"),
            v.alias("_v0"),
            F.lead(t0).over(w).alias("_t1"),
            F.lead(v).over(w).alias("_v1"),
        )
        .where(F.col("_t1").isNotNull() & (F.col("_t1") > F.col("_t0")))
    )
    if max_gap_sec is not None:
        seg = seg.where(F.col("_t1") - F.col("_t0") <= max_gap_sec)

    # every bucket edge the segment touches; pieces clamped to the segment
    edges = F.sequence(
        (F.floor(F.col("_t0") / sec) * sec).cast("long"),
        (F.floor(F.col("_t1") / sec) * sec).cast("long"),
        F.lit(sec),
    )
    dt = F.col("_t1") - F.col("_t0")
    slope = (F.col("_v1") - F.col("_v0")) / dt

    def _val_at(x):  # interpolated value at time x within the segment
        if method == "locf":
            return F.col("_v0")
        return F.col("_v0") + slope * (x - F.col("_t0"))

    pieces = F.transform(
        edges,
        lambda e: F.struct(
            e.alias("bucket_start"),
            F.greatest(F.col("_t0"), e.cast("double")).alias("a"),
            F.least(F.col("_t1"), (e + sec).cast("double")).alias("b"),
        ),
    )
    ex = seg.select(key_col, "_t0", "_v0", "_t1", "_v1", F.explode(pieces).alias("p"))
    a, b = F.col("p.a"), F.col("p.b")
    width = b - a
    if method == "locf":
        area = width * F.col("_v0")
    else:
        area = width * (_val_at(a) + _val_at(b)) / 2.0
    return (
        ex.where(width > 0)
        .groupBy(F.col(key_col), F.col("p.bucket_start").alias("bucket_start"))
        .agg(
            F.sum(area).alias("integral"),
            F.sum(width).alias("covered_sec"),
        )
        .withColumn("twa", F.col("integral") / F.col("covered_sec"))
    )


def time_weighted_cascade(
    fine: DataFrame,
    to_tier: str,
    key_col: str = "series_key",
) -> DataFrame:
    """Plain additive merge — exactly equals the direct rollup (every
    covered instant belongs to exactly one fine bucket)."""
    sec = TIER_SECONDS[to_tier]
    return (
        fine.groupBy(
            F.col(key_col),
            ((F.floor(F.col("bucket_start") / sec) * sec).cast("long")).alias(
                "bucket_start"
            ),
        )
        .agg(
            F.sum("integral").alias("integral"),
            F.sum("covered_sec").alias("covered_sec"),
        )
        .withColumn("twa", F.col("integral") / F.col("covered_sec"))
    )
