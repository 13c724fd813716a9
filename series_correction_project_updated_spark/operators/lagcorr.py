"""Lag correlation over the aligned tier grid: ACF per series, and
lead–lag cross-correlation (CCF) between two series families.

"Does this series repeat daily?" (autocorrelation peak at lag 24 on the
1h tier) and "does metric A lead metric B by k buckets?" (CCF argmax)
are the standard diagnostics BEFORE choosing a seasonal period
(``seasonal_decompose``) or a forecasting horizon (``holt_forecast``).

Contract: input rows live on a REGULAR grid — one row per (key, bucket)
with ``step`` seconds between buckets, i.e. exactly what the rollup
tiers emit. Run ``rollup()`` (or ``gapfill``) first for irregular raw
points; lag on an irregular axis is not defined here. Missing buckets
are fine — a (x_t, y_{t+lag}) pair simply doesn't form, matching
pandas ``Series.autocorr`` / ``DataFrame.corr`` NaN-pair semantics.

Shape — ONE row-scaled shuffle, not a lag-scaled one: all lags are
read out of a single window sort via per-lag RANGE frames
(``rangeBetween(lag, lag)`` over the bucket index: the frame holds
exactly the row ``lag`` buckets away, or nothing at a hole — Spark
evaluates every frame group inside one Window operator over one sort).
CCF unions the y side in with a tag column first (the as-of trick), so
x and y co-sort and the same frames read y values. The exploded
(lag, pair) rows then feed the stats tier's moment aggregate
(``stats_eval``'s guarded corr) — map-side partials collapse them to
(key × lag) rows before the final exchange, so the explode never
shuffles. The first implementation exploded the y side BEFORE an
equi-join, shuffling rows × n_lags; measured at 1.17M buckets × 24
lags the window shape is ~4× faster (3.65s vs 14.5s min-of-2 at
local[8], clean 6.5-7.2M probes) and the gap grows with the lag count
— ``strategy="join"`` keeps the join shape as a cross-check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stats import stats_eval

__all__ = ["lag_corr", "autocorr"]


def _moment_corr(pairs: DataFrame, key_col: str) -> DataFrame:
    xc, yc = F.col("_x"), F.col("_y")
    sums = pairs.groupBy(F.col("_k").alias(key_col), "lag").agg(
        F.count("*").alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(xc * yc).alias("sxy"),
    )
    return stats_eval(sums).select(key_col, "lag", "n", "corr")


def lag_corr(
    x: DataFrame,
    lags: Sequence[int],
    step: float,
    y: DataFrame | None = None,
    key_col: str = "series_key",
    time_col: str = "bucket_start",
    value_col: str = "value",
    y_value_col: str | None = None,
    strategy: str = "window",
) -> DataFrame:
    """Pearson corr(x_t, y_{t+lag}) per (key, lag) → (key, lag, n, corr).

    ``y=None`` → autocorrelation of ``x``. Positive lag means y FOLLOWS
    x by ``lag`` buckets (y leads when the peak sits at negative lag).
    ``step``: grid spacing in seconds (e.g. ``TIER_SECONDS['1h']``).
    Rows must be unique per (key, bucket) — the tier-store contract;
    duplicate grid rows would silently multiply pairs.
    """
    if not lags:
        raise ValueError("lags must be non-empty")
    if strategy not in ("window", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    yv = y_value_col or value_col

    idx = lambda c: F.floor(F.col(c).cast("double") / F.lit(float(step))).cast("long")  # noqa: E731
    left = x.select(
        F.col(key_col).alias("_k"),
        idx(time_col).alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    ).where(F.col("_x").isNotNull())

    if strategy == "join":
        right = (
            (x if y is None else y)
            .select(
                F.col(key_col).alias("_k"),
                idx(time_col).alias("_j"),
                F.col(yv).cast("double").alias("_y"),
            )
            .where(F.col("_y").isNotNull())
            .select(
                "_k",
                "_y",
                F.explode(F.array(*[F.lit(int(l)) for l in lags])).alias("lag"),
                "_j",
            )
            .select("_k", "_y", "lag", (F.col("_j") - F.col("lag")).alias("_i"))
        )
        return _moment_corr(left.join(right, on=["_k", "_i"]), key_col)

    # window strategy: one sort serves every lag via range frames
    if y is None:
        rows = left.select("_k", "_i", "_x", F.col("_x").alias("_yv"))
    else:
        yside = (
            y.select(
                F.col(key_col).alias("_k"),
                idx(time_col).alias("_i"),
                F.col(yv).cast("double").alias("_yv"),
            )
            .where(F.col("_yv").isNotNull())
            .select("_k", "_i", F.lit(None).cast("double").alias("_x"), "_yv")
        )
        rows = left.select(
            "_k", "_i", "_x", F.lit(None).cast("double").alias("_yv")
        ).unionByName(yside)

    # window exprs can't sit inside a generator — materialize the lag
    # columns (one Window operator, one sort), then explode plain columns
    w = Window.partitionBy("_k").orderBy("_i")
    lagged = rows.select(
        "_k",
        "_x",
        *[
            F.first("_yv", ignorenulls=True)
            .over(w.rangeBetween(int(l), int(l)))
            .alias(f"_y_{i}")
            for i, l in enumerate(lags)
        ],
    )
    pairs = (
        lagged.select(
            "_k",
            "_x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(int(l)).alias("lag"), F.col(f"_y_{i}").alias("_y")
                        )
                        for i, l in enumerate(lags)
                    ]
                )
            ).alias("p"),
        )
        .select("_k", "_x", F.col("p.lag").alias("lag"), F.col("p._y").alias("_y"))
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    )
    return _moment_corr(pairs, key_col)


def autocorr(
    tier: DataFrame,
    max_lag: int,
    step: float,
    key_col: str = "series_key",
    time_col: str = "bucket_start",
    value_col: str = "value",
) -> DataFrame:
    """ACF at lags 1..max_lag per series (the seasonality probe:
    ``argmax(corr)`` over lags is the period candidate)."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    return lag_corr(
        tier,
        list(range(1, max_lag + 1)),
        step,
        key_col=key_col,
        time_col=time_col,
        value_col=value_col,
    )
