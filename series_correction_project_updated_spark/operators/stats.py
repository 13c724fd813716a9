"""Mergeable 2D-statistics tiers (regression / correlation aggregates,
TimescaleDB ``stats_agg`` semantics).

"Per-hour trend slope of every series" or "rolling correlation between
two aligned series" needs second-moment sums, and a tier of them must
CASCADE: the stored form is the bucket-local moment vector

    n, sx, sy, sxx, syy, sxy      with x taken RELATIVE TO THE BUCKET
                                  START (x = t − bucket_start)

Centering x on the bucket start is the load-bearing precision choice:
raw epoch timestamps (~1.7e9) square to ~3e18 — above double's 2^53
integer ceiling — so uncentered ``Σx²`` would shred the variance by
catastrophic cancellation at any real scale. Bucket-local offsets stay
≤ 86400 even for the 1d tier (x² ≤ 7.5e9, exact in doubles for integral
seconds). y is stored uncentered (physical magnitudes, no epoch
blow-up).

Cascade re-centers by exact algebra before summing — for a fine bucket
whose start is ``s = fine_start − coarse_start`` (bounded by the coarse
tier width):

    sx'  = sx + n·s
    sxx' = sxx + 2·s·sx + n·s²
    sxy' = sxy + s·sy

then plain SUMs — all JVM column expressions, one shuffle, no Python.
``stats_eval`` derives slope / intercept / corr / r² / variances from
the sums at read time (never stored — derived quantities don't merge).

Determinism/exactness: the sums are float folds, so cascade == direct
to reassociation (~1e-12 relative, test-pinned); n is exact. Derived
slope/corr match numpy's polyfit/corrcoef on the same points (pinned)
and DuckDB's regr_* (cross-checked in pytest).

For TWO-series correlation, align first (the store's (key, t) contract
makes an inner join on (key, t) exact; use ``asof_join`` for
mixed-cadence series), then feed (x=left value, y=right value) with
``x_origin=None`` — correlation is translation-invariant, but there is
no bucket-relative re-centering for a value axis, so the same epoch
caveat applies if x is a timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import TIER_SECONDS

_SUMS = ["n", "sx", "sy", "sxx", "syy", "sxy"]


def stats_rollup(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    x_col: str | None = None,
) -> DataFrame:
    """Per-(key, bucket) moment sums. Default regresses value against
    bucket-relative TIME (per-bucket trend); pass ``x_col`` to regress
    value (y) against another column (x, kept un-centered)."""
    sec = TIER_SECONDS[tier]
    t = F.col(time_col).cast("timestamp_ltz").cast("double")
    bucket = (F.floor(t / sec) * sec).cast("long")
    y = F.col(value_col).cast("double")
    x = F.col(x_col).cast("double") if x_col else (t - bucket.cast("double"))
    pts = points.where(y.isNotNull()).select(
        F.col(key_col),
        bucket.alias("bucket_start"),
        x.alias("_x"),
        y.alias("_y"),
    ).where(F.col("_x").isNotNull())
    xc, yc = F.col("_x"), F.col("_y")
    return pts.groupBy(key_col, "bucket_start").agg(
        F.count("*").alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(xc * yc).alias("sxy"),
    )


def stats_cascade(
    fine: DataFrame,
    to_tier: str,
    key_col: str = "series_key",
    recentered: bool = True,
) -> DataFrame:
    """Merge fine moment buckets into a coarser tier. ``recentered=True``
    (the time-regression default) shifts each fine bucket's x-origin to
    the coarse bucket start before summing; pass ``False`` for
    ``x_col``-mode tiers (absolute x, no re-centering)."""
    sec = TIER_SECONDS[to_tier]
    coarse = (F.floor(F.col("bucket_start") / sec) * sec).cast("long")
    if recentered:
        s = (F.col("bucket_start") - coarse).cast("double")
        shifted = fine.select(
            F.col(key_col),
            coarse.alias("bucket_start"),
            F.col("n"),
            (F.col("sx") + F.col("n") * s).alias("sx"),
            F.col("sy"),
            (F.col("sxx") + 2.0 * s * F.col("sx") + F.col("n") * s * s).alias("sxx"),
            F.col("syy"),
            (F.col("sxy") + s * F.col("sy")).alias("sxy"),
        )
    else:
        shifted = fine.select(
            F.col(key_col), coarse.alias("bucket_start"), *[F.col(c) for c in _SUMS]
        )
    return shifted.groupBy(key_col, "bucket_start").agg(
        F.sum("n").alias("n"),
        *[F.sum(c).alias(c) for c in _SUMS[1:]],
    )


def stats_eval(tier_df: DataFrame) -> DataFrame:
    """Derive slope / intercept / corr / r2 / var_x / var_y (sample
    variances, ddof=1) from stored moment sums. Single-point buckets
    yield nulls (no spread); zero-variance axes yield null slope/corr
    (``try_divide`` semantics — no NaN/inf leaks into stores)."""
    n = F.col("n").cast("double")
    mx, my = F.col("sx") / n, F.col("sy") / n
    # Σ(x-mx)(y-my) = sxy - n·mx·my, etc. — bucket-local x keeps these stable.
    # n=1 buckets are definitionally zero-spread, but after a cascade
    # re-center the subtraction leaves ~1e-9 float noise instead of an
    # exact 0, turning the try_divide null into garbage-noise slope/corr
    # (and a possibly NEGATIVE m2, NaN-ing corr's sqrt). Pin n=1 to exact
    # zero and clamp residual negative noise.
    one = F.col("n") == 1
    cxy = F.when(one, F.lit(0.0)).otherwise(F.col("sxy") - n * mx * my)
    m2x = F.when(one, F.lit(0.0)).otherwise(
        F.greatest(F.col("sxx") - n * mx * mx, F.lit(0.0))
    )
    m2y = F.when(one, F.lit(0.0)).otherwise(
        F.greatest(F.col("syy") - n * my * my, F.lit(0.0))
    )
    slope = F.try_divide(cxy, m2x)
    corr_raw = F.try_divide(cxy, F.sqrt(m2x * m2y))
    r2_raw = F.try_divide(cxy * cxy, m2x * m2y)
    return tier_df.select(
        "*",
        slope.alias("slope"),
        (my - slope * mx).alias("intercept"),
        # perfect-fit buckets can land a few ulps outside [-1, 1] / [0, 1];
        # clamp only non-null values (least/greatest SKIP nulls, so a bare
        # clamp would turn a degenerate bucket's null into ±1)
        F.when(
            corr_raw.isNotNull(),
            F.greatest(F.lit(-1.0), F.least(F.lit(1.0), corr_raw)),
        ).alias("corr"),
        F.when(r2_raw.isNotNull(), F.least(F.lit(1.0), r2_raw)).alias("r2"),
        F.try_divide(m2x, n - 1.0).alias("var_x"),
        F.try_divide(m2y, n - 1.0).alias("var_y"),
    )
