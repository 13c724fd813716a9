"""Additive seasonal decomposition: pandas cross-check of the exact
definition, planted-pattern recovery, even/odd periods, plan shape."""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.seasonal import seasonal_decompose


def _pandas_decompose(x: np.ndarray, period: int):
    """Independent reference: statsmodels-style additive decomposition."""
    s = pd.Series(x)
    if period % 2 == 1:
        trend = s.rolling(period, center=True).mean().to_numpy()
    else:
        w = np.ones(period + 1)
        w[0] = w[-1] = 0.5
        trend = (
            s.rolling(period + 1, center=True)
            .apply(lambda a: np.dot(a, w) / period, raw=True)
            .to_numpy()
        )
    detr = x - trend
    phases = np.arange(len(x)) % period
    pm = np.array(
        [np.nanmean(detr[phases == p]) if np.any(~np.isnan(detr[phases == p])) else np.nan
         for p in range(period)]
    )
    pm = pm - np.nanmean(pm)
    seasonal = pm[phases]
    return trend, seasonal, x - trend - seasonal


def _mk(spark, x, key="s"):
    pdf = pd.DataFrame(
        {"series_key": key, "t": np.arange(len(x), dtype=np.float64), "value": x}
    )
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("period", [7, 12])
def test_matches_pandas_reference(spark, period):
    rng = np.random.default_rng(4)
    n = 40 * period
    x = (
        10.0
        + 0.03 * np.arange(n)
        + np.tile(rng.normal(0, 2.0, period), 40)
        + rng.normal(0, 0.3, n)
    )
    got = (
        seasonal_decompose(_mk(spark, x), period)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    trend, seasonal, resid = _pandas_decompose(x, period)
    np.testing.assert_allclose(got["trend"].to_numpy(), trend, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["seasonal"].to_numpy(), seasonal, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(got["resid"].to_numpy(), resid, rtol=1e-9, atol=1e-10)


def test_recovers_planted_pattern(spark):
    """Pure trend + seasonal signal: the recovered seasonal equals the
    planted (centered) pattern and interior residuals vanish."""
    period = 6
    pattern = np.array([3.0, -1.0, 0.5, -2.0, 1.5, -2.0])
    pattern -= pattern.mean()
    n = 60 * period
    x = 5.0 + 0.1 * np.arange(n) + np.tile(pattern, 60)
    got = (
        seasonal_decompose(_mk(spark, x), period)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    inner = got.iloc[period : n - period]
    for p in range(period):
        rows = inner[inner["phase"] == p]
        np.testing.assert_allclose(rows["seasonal"], pattern[p], atol=1e-9)
    np.testing.assert_allclose(inner["resid"].dropna(), 0.0, atol=1e-9)
    # edge rows: incomplete centered window -> null trend and resid
    assert got["trend"].head(3).isna().all()
    assert got["resid"].head(3).isna().all()
    assert got["trend"].tail(3).isna().all()


def test_multiple_series_independent(spark):
    rng = np.random.default_rng(8)
    frames = []
    for k in ("a", "b"):
        x = rng.normal(0, 1, 60)
        frames.append(
            pd.DataFrame({"series_key": k, "t": np.arange(60.0), "value": x})
        )
    df = spark.createDataFrame(pd.concat(frames))
    got = seasonal_decompose(df, 5).toPandas()
    for k, grp in got.groupby("series_key"):
        x = grp.sort_values("t")["value"].to_numpy()
        trend, seasonal, resid = _pandas_decompose(x, 5)
        np.testing.assert_allclose(
            grp.sort_values("t")["trend"].to_numpy(), trend, rtol=1e-9, atol=1e-12
        )


def test_bad_period_rejected(spark):
    with pytest.raises(ValueError):
        seasonal_decompose(_mk(spark, np.arange(10.0)), 1)


def test_plan_two_raw_shuffles_broadcast_join(spark):
    df = _mk(spark, np.arange(200.0))
    plan = (
        seasonal_decompose(df, 7)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
