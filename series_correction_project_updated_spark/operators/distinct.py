"""Mergeable distinct-count tiers (HLL sketch continuous aggregates).

The rollup tiers carry cnt/sum/min/max/first/last because those
re-aggregate upward exactly (`rollup.cascade`). DISTINCT counts don't —
``count(distinct user)`` per 1m bucket cannot produce the 1h number —
so production continuous-aggregate systems store a mergeable sketch per
bucket instead. Spark ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
JVM-side, binary sketch column), which gives the exact same law the
numeric cascade obeys:

    distinct_cascade(distinct_rollup(raw, "1m"), "1h")
        == distinct_rollup(raw, "1h")           (estimate-identical)

because HLL union is associative over any partition of the input — the
tests pin estimate identity per bucket, plus EXACT equality against
``countDistinct`` while buckets are in sparse mode (serialized bytes can
differ between paths: sparse serialization is insertion-ordered). Error
is the standard HLL ±~1.6% at lgConfigK=12 (default); raise lgConfigK
for tighter bounds. Scale shape: one hash aggregate per tier (sketches
merge map-side like any partial agg), a few-KB binary per (key, bucket)
— 10^9 buckets ≈ low TB of sketch storage serving any-window distinct
queries with no raw re-scan.

No reference counterpart; extends the rollup/retention layer the same
way `q_rollup_*`'s tiers do (storage-layout compatible: bucket_start is
the same epoch-seconds bucket the numeric tiers use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import TIER_SECONDS


def _bucket(time_col: str, sec: int):
    # via ltz: NTZ timestamps can't cast straight to double, numeric epoch
    # columns round-trip unchanged (session tz pinned UTC)
    t = F.col(time_col).cast("timestamp_ltz").cast("double")
    return (F.floor(t / sec) * sec).cast("long")


def distinct_rollup(
    df: DataFrame,
    tier: str = "1m",
    id_col: str = "user_id",
    time_col: str = "ts",
    key_col: str | None = None,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-bucket HLL sketch + estimate of ``approx_distinct(id_col)``.

    ``key_col=None`` gives global per-bucket distincts; a key gives
    per-(key, bucket) series. The ``sketch`` column is what you persist —
    the estimate is derivable, the sketch is mergeable.
    """
    sec = TIER_SECONDS[tier]
    keys = ([F.col(key_col)] if key_col else []) + [
        _bucket(time_col, sec).alias("bucket_start")
    ]
    return (
        df.groupBy(*keys)
        .agg(F.hll_sketch_agg(id_col, F.lit(lg_config_k)).alias("sketch"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


def distinct_cascade(
    fine: DataFrame,
    to_tier: str,
    key_col: str | None = None,
) -> DataFrame:
    """Merge a finer tier's sketches into a coarser tier — never re-reads
    raw data. Equals ``distinct_rollup(raw, to_tier)`` sketch-for-sketch
    (HLL union associativity; test-pinned bit-equality)."""
    sec = TIER_SECONDS[to_tier]
    keys = ([F.col(key_col)] if key_col else []) + [
        _bucket("bucket_start", sec).alias("bucket_start")
    ]
    return (
        fine.groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


def rolling_distinct(
    tier_df: DataFrame,
    buckets: int,
    tier: str = "1d",
    key_col: str | None = None,
    out_col: str = "rolling_distinct",
) -> DataFrame:
    """Trailing-N-bucket distinct counts from stored sketches — the
    DAU→WAU/MAU payoff of keeping sketches instead of numbers: a 7- or
    30-day active-user series is a window UNION over the daily tier, no
    raw re-scan, exact in sparse mode. ``hll_union_agg`` runs as a window
    aggregate (range frame over ``bucket_start``), so missing days
    simply contribute nothing.

    The global (keyless) variant windows over ONE ordered partition —
    fine, because the input is the tier itself (one row per bucket), not
    raw data; pass ``key_col`` for per-key series, which partitions the
    window.
    """
    sec = TIER_SECONDS[tier]
    w = Window.partitionBy(*([key_col] if key_col else [])).orderBy(
        "bucket_start"
    ).rangeBetween(-(buckets - 1) * sec, 0)
    return tier_df.withColumn(
        out_col, F.hll_sketch_estimate(F.hll_union_agg("sketch").over(w))
    )
