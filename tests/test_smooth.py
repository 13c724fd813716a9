"""EWM smoothing: blocked-scan kernel vs pandas ewm, Spark operator vs
per-series pandas oracle (with nulls), partitioning invariance, spike
anomaly score, one-shuffle plan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.smooth import (
    ewm_mean_var,
    ewma_smooth,
)
from series_correction_project_updated_spark.sources.synth import (
    generate_pages,
    pages_to_series,
)


@pytest.mark.parametrize("alpha", [0.9, 0.5, 0.1, 0.01, 0.001])
def test_kernel_matches_pandas_ewm(alpha):
    rng = np.random.default_rng(5)
    x = rng.normal(10, 3, 5000)
    y, v = ewm_mean_var(x, alpha)
    s = pd.Series(x)
    np.testing.assert_allclose(
        y, s.ewm(alpha=alpha, adjust=False).mean().to_numpy(), rtol=1e-12
    )
    refv = s.ewm(alpha=alpha, adjust=False).var(bias=True).to_numpy()
    refv[0] = 0.0
    np.testing.assert_allclose(v, refv, rtol=1e-10, atol=1e-12)


def test_kernel_edge_cases():
    y, v = ewm_mean_var(np.array([7.0]), 0.3)
    assert y[0] == 7.0 and v[0] == 0.0
    y, v = ewm_mean_var(np.empty(0), 0.3)
    assert len(y) == 0
    # alpha=1: no memory — mean follows x exactly, variance 0
    x = np.array([1.0, 5.0, 2.0])
    y, v = ewm_mean_var(x, 1.0)
    np.testing.assert_array_equal(y, x)
    np.testing.assert_array_equal(v, np.zeros(3))


@pytest.mark.parametrize(
    "alpha,beta",
    [(0.3, 0.1), (0.5, 0.3), (0.9, 0.5), (0.05, 0.01), (0.2, 0.9), (1.0, 0.5), (0.3, 1.0)],
)
def test_holt_vectorized_matches_scalar(alpha, beta):
    from series_correction_project_updated_spark.operators.smooth import (
        holt_level_trend,
        holt_scalar,
    )

    rng = np.random.default_rng(2)
    x = np.cumsum(rng.normal(0.1, 1.0, 8000)) + 50
    l1, t1 = holt_scalar(x, alpha, beta)
    l2, t2 = holt_level_trend(x, alpha, beta)
    scale = np.maximum(np.abs(l1), 1.0)
    assert np.max(np.abs(l1 - l2) / scale) < 1e-10
    assert np.max(np.abs(t1 - t2) / scale) < 1e-10


def test_holt_linear_series_recovers_slope():
    """On an exactly linear series the trend converges to the slope and
    the one-step forecast to the next value (classic Holt sanity)."""
    from series_correction_project_updated_spark.operators.smooth import holt_level_trend

    x = 3.0 + 0.7 * np.arange(2000)
    level, trend = holt_level_trend(x, 0.3, 0.1)
    assert abs(trend[-1] - 0.7) < 1e-6
    assert abs(level[-1] - x[-1]) < 1e-4


@pytest.fixture(scope="module")
def series(spark):
    s = pages_to_series(
        generate_pages(spark, n_urls=8, samples_per_url=200, interval_sec=60)
    )
    # inject nulls on a deterministic stripe
    return s.withColumn(
        "value", F.when(F.xxhash64("series_key", "t") % 17 == 0, None).otherwise(F.col("value"))
    ).cache()


def test_operator_matches_pandas_per_series(spark, series):
    alpha = 0.2
    got = (
        ewma_smooth(series, alpha)
        .toPandas()
        .sort_values(["series_key", "t"])
        .reset_index(drop=True)
    )
    raw = series.toPandas().sort_values(["series_key", "t"]).reset_index(drop=True)
    assert len(got) == len(raw)
    for key, grp in raw.groupby("series_key"):
        sub = got[got["series_key"] == key].reset_index(drop=True)
        valid = grp["value"].notna().to_numpy()
        ref = grp.loc[valid, "value"].reset_index(drop=True)
        em = ref.ewm(alpha=alpha, adjust=False).mean().to_numpy()
        ev = ref.ewm(alpha=alpha, adjust=False).var(bias=True).to_numpy()
        ev[0] = 0.0
        np.testing.assert_allclose(sub.loc[valid, "ewma"], em, rtol=1e-10)
        np.testing.assert_allclose(
            sub.loc[valid, "ewm_std"], np.sqrt(ev), rtol=1e-9, atol=1e-12
        )
        # null-value rows carry null outputs
        assert sub.loc[~valid, ["ewma", "ewm_std", "ewm_z"]].isna().all().all()


def test_partitioning_invariance(spark, series):
    a = ewma_smooth(series.repartition(3), 0.1).toPandas()
    b = ewma_smooth(series.repartition(11, "t"), 0.1).toPandas()
    a = a.sort_values(["series_key", "t"]).reset_index(drop=True)
    b = b.sort_values(["series_key", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_spike_scores_anomalous(spark):
    pdf = pd.DataFrame(
        {
            "series_key": "s",
            "t": np.arange(200, dtype=np.float64),
            "value": np.sin(np.arange(200) / 9.0) * 0.5 + 10.0,
        }
    )
    pdf.loc[150, "value"] = 40.0  # isolated spike
    out = (
        ewma_smooth(spark.createDataFrame(pdf), 0.1)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    z = out["ewm_z"].to_numpy()
    assert abs(z[150]) > 10.0
    normal = np.abs(np.concatenate([z[20:150], z[160:]]))
    assert np.nanmax(normal) < 5.0


def test_holt_operator_matches_scalar_per_series(spark, series):
    from series_correction_project_updated_spark.operators.smooth import (
        holt_scalar,
        holt_smooth,
    )

    got = (
        holt_smooth(series, 0.4, 0.2)
        .toPandas()
        .sort_values(["series_key", "t"])
        .reset_index(drop=True)
    )
    raw = series.toPandas().sort_values(["series_key", "t"]).reset_index(drop=True)
    for key, grp in raw.groupby("series_key"):
        sub = got[got["series_key"] == key].reset_index(drop=True)
        valid = grp["value"].notna().to_numpy()
        x = grp.loc[valid, "value"].to_numpy()
        level, trend = holt_scalar(x, 0.4, 0.2)
        scale = np.maximum(np.abs(level), 1.0)
        assert np.max(np.abs(sub.loc[valid, "level"].to_numpy() - level) / scale) < 1e-10
        assert np.max(np.abs(sub.loc[valid, "trend"].to_numpy() - trend) / scale) < 1e-10
        yh = sub.loc[valid, "yhat"].to_numpy()
        assert np.isnan(yh[0])
        np.testing.assert_allclose(yh[1:], level[:-1] + trend[:-1], rtol=1e-9)
        assert sub.loc[~valid, ["level", "trend", "yhat"]].isna().all().all()


def test_bad_alpha_rejected(spark, series):
    with pytest.raises(ValueError):
        ewma_smooth(series, 0.0)
    with pytest.raises(ValueError):
        ewma_smooth(series, 1.5)


def test_one_shuffle_plan(spark, series):
    plan = ewma_smooth(series, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan


def test_holt_forecast_matches_scalar_frontier(spark, series):
    from series_correction_project_updated_spark.operators.smooth import (
        holt_forecast,
        holt_scalar,
    )

    h, step, alpha, beta = 5, 60.0, 0.4, 0.2
    got = (
        holt_forecast(series, alpha, beta, horizon=h, step=step)
        .toPandas()
        .sort_values(["series_key", "k"])
        .reset_index(drop=True)
    )
    raw = series.toPandas().sort_values(["series_key", "t"]).reset_index(drop=True)
    keys = sorted(raw["series_key"].unique())
    assert sorted(got["series_key"].unique()) == keys
    assert len(got) == h * len(keys)
    for key, grp in raw.groupby("series_key"):
        sub = got[got["series_key"] == key].sort_values("k")
        valid = grp["value"].notna()
        x = grp.loc[valid, "value"].to_numpy()
        t_last = grp.loc[valid, "t"].max()
        level, trend = holt_scalar(x, alpha, beta)
        ks = np.arange(1, h + 1)
        np.testing.assert_allclose(
            sub["yhat"].to_numpy(), level[-1] + ks * trend[-1], rtol=1e-9
        )
        np.testing.assert_allclose(
            sub["t"].to_numpy(), float(t_last) + ks * step, rtol=0, atol=1e-6
        )


def test_holt_forecast_linear_series_extrapolates_exactly(spark):
    from series_correction_project_updated_spark.operators.smooth import holt_forecast

    # long linear ramp -> level/trend converge to the line; the h-step
    # forecast continues it
    pdf = pd.DataFrame(
        {
            "series_key": "a",
            "t": np.arange(400, dtype=np.float64) * 10.0,
            "value": 5.0 + 3.0 * np.arange(400, dtype=np.float64),
        }
    )
    out = (
        holt_forecast(spark.createDataFrame(pdf), 0.3, 0.1, horizon=3, step=10.0)
        .toPandas()
        .sort_values("k")
    )
    want = 5.0 + 3.0 * (399 + np.arange(1, 4))
    np.testing.assert_allclose(out["yhat"].to_numpy(), want, rtol=1e-6)


def test_holt_forecast_validation(spark, series):
    from series_correction_project_updated_spark.operators.smooth import holt_forecast

    with pytest.raises(ValueError):
        holt_forecast(series, 0.3, 0.1, horizon=0, step=60.0)
    with pytest.raises(ValueError):
        holt_forecast(series, 0.3, 0.1, horizon=2, step=0.0)


def test_fused_equals_union(spark, series):
    """r6: ewma_holt_smooth (one kernel pass) must be row-identical to the
    union of the two standalone operators with a discriminator column."""
    from series_correction_project_updated_spark.operators.smooth import (
        ewma_holt_smooth,
        holt_smooth,
    )

    alpha, beta = 1 / 3, 1 / 7
    fused = (
        ewma_holt_smooth(series, alpha, beta)
        .orderBy("op", "series_key", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    e = ewma_smooth(series, alpha).select(
        F.lit("ewm").alias("op"), "series_key", "t", "value",
        F.col("ewma").alias("m1"), F.col("ewm_std").alias("m2"), F.col("ewm_z").alias("m3"),
    )
    h = holt_smooth(series, alpha, beta).select(
        F.lit("holt").alias("op"), "series_key", "t", "value",
        F.col("level").alias("m1"), F.col("trend").alias("m2"), F.col("yhat").alias("m3"),
    )
    want = (
        e.unionByName(h)
        .orderBy("op", "series_key", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, want, check_exact=True)
