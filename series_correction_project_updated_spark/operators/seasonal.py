"""Classic additive seasonal decomposition (trend / seasonal / residual).

``value = trend + seasonal + resid`` per series, the moving-average
decomposition every stats stack ships (statsmodels
``seasonal_decompose(model='additive')``): trend is the centered
moving average of width ``period`` (the standard 2xMA when ``period``
is even), seasonal is the per-phase mean of the detrended series
re-centered to sum to zero over a cycle, residual is what remains.
Assumes evenly-spaced samples per series — exactly what the engine's
gap-fill (``correct_series``) produces upstream; phase is
``row_number % period``.

All JVM, no Python: one window pass over series clustering for the
trend (ROWS frames; partial edge windows yield null trend, matching
statsmodels), one map-side-combining aggregate for the per-phase
means, and the seasonal table (keys x period rows — tiny) BROADCASTS
back, so raw data shuffles once for the window and once (column-pruned
detrended pairs) for the aggregate; no third raw shuffle for the join.
Pandas cross-check + planted-pattern recovery + plan shape in
``tests/test_seasonal.py``; pytest (the 50-entry driver registry is
full).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seasonal_decompose(
    points: DataFrame,
    period: int,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Adds ``phase``, ``trend``, ``seasonal``, ``resid`` columns.

    ``trend`` is null where the centered window is incomplete (series
    edges); ``seasonal`` is defined for every row of a phase that has at
    least one complete-window cycle; ``resid = value - trend -
    seasonal`` (null wherever trend is).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")

    w_ord = Window.partitionBy(key_col).orderBy(time_col)
    pts = points.withColumn("_i", F.row_number().over(w_ord) - 1)
    pts = pts.withColumn("phase", (F.col("_i") % period).cast("int"))

    half = period // 2
    v = F.col(value_col)
    if period % 2 == 1:
        w_ma = w_ord.rowsBetween(-half, half)
        trend = F.when(F.count(v).over(w_ma) == period, F.avg(v).over(w_ma))
    else:
        # even period: width-(period+1) window with half-weight endpoints
        # == the classic MA(period) then MA(2)
        w_ma = w_ord.rowsBetween(-half, half)
        full = F.count(v).over(w_ma) == period + 1
        s = F.sum(v).over(w_ma)
        ends = F.first(v).over(w_ma) + F.last(v).over(w_ma)
        trend = F.when(full, (s - ends / 2) / period)
    pts = pts.withColumn("trend", trend)

    detr = (
        pts.where(F.col("trend").isNotNull())
        .groupBy(key_col, "phase")
        .agg(F.avg(v - F.col("trend")).alias("_phase_mean"))
    )
    w_key = Window.partitionBy(key_col)
    seasonal = detr.withColumn(
        "seasonal", F.col("_phase_mean") - F.avg("_phase_mean").over(w_key)
    ).select(key_col, "phase", "seasonal")

    out = pts.join(F.broadcast(seasonal), on=[key_col, "phase"], how="left")
    return out.withColumn("resid", v - F.col("trend") - F.col("seasonal")).drop("_i")
