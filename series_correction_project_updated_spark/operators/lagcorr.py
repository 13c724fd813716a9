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

Shape (one shuffle): the y side explodes over the requested lags
(rows × n_lags — lag lists are small, tens not thousands), the pair is
formed by an equi-join on (key, bucket_index) — never a range join —
and Pearson corr per (key, lag) comes from the SAME moment-sum algebra
as the stats tier (one hash aggregate with map-side partials,
``stats_eval``'s guarded corr). Hot keys cost one join partition each;
signatures of the plan: Exchange(key,idx) → SortMergeJoin/BHJ →
HashAggregate — no Python anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import stats_eval

__all__ = ["lag_corr", "autocorr"]


def lag_corr(
    x: DataFrame,
    lags: Sequence[int],
    step: float,
    y: DataFrame | None = None,
    key_col: str = "series_key",
    time_col: str = "bucket_start",
    value_col: str = "value",
    y_value_col: str | None = None,
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
    y = x if y is None else y
    yv = y_value_col or value_col

    idx = lambda c: F.floor(F.col(c).cast("double") / F.lit(float(step))).cast("long")  # noqa: E731
    left = x.select(
        F.col(key_col).alias("_k"),
        idx(time_col).alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    ).where(F.col("_x").isNotNull())
    # y row at bucket j pairs with x at j - lag: emit (key, j - lag, lag, y)
    right = (
        y.select(
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

    pairs = left.join(right, on=["_k", "_i"])
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
