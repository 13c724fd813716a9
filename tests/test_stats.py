"""Mergeable 2D-stats tier: derived stats vs numpy + DuckDB, cascade ==
direct, epoch-precision guard."""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.stats import (
    stats_cascade,
    stats_eval,
    stats_rollup,
)


def _pdf(seed=7, n=2000, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    frames = []
    for k in keys:
        t = 1.7e9 + np.sort(rng.uniform(0, 6 * 3600, n))
        v = 40.0 + 0.003 * (t - 1.7e9) + rng.normal(0, 2.0, n)
        frames.append(pd.DataFrame({"series_key": k, "t": t, "value": v}))
    return pd.concat(frames, ignore_index=True)


def test_derived_stats_match_numpy(spark):
    pdf = _pdf()
    got = (
        stats_eval(stats_rollup(spark.createDataFrame(pdf), "1h"))
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    assert len(got) >= 12
    for (k, b), row in got.iterrows():
        g = pdf[pdf["series_key"] == k]
        g = g[(g["t"] >= b) & (g["t"] < b + 3600)]
        x = g["t"].to_numpy() - b
        y = g["value"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        assert row["n"] == len(g)
        np.testing.assert_allclose(row["slope"], slope, rtol=1e-9)
        np.testing.assert_allclose(row["intercept"], intercept, rtol=1e-9)
        np.testing.assert_allclose(
            row["corr"], np.corrcoef(x, y)[0, 1], rtol=1e-9
        )
        np.testing.assert_allclose(row["var_x"], x.var(ddof=1), rtol=1e-9)
        np.testing.assert_allclose(row["var_y"], y.var(ddof=1), rtol=1e-9)


def test_cascade_equals_direct(spark):
    df = spark.createDataFrame(_pdf(seed=11))
    fine = stats_rollup(df, "1m")
    via = (
        stats_cascade(fine, "1h")
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    direct = (
        stats_rollup(df, "1h")
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    assert via.index.equals(direct.index)
    np.testing.assert_array_equal(via["n"], direct["n"])  # counts exact
    for c in ("sx", "sy", "sxx", "syy", "sxy"):
        np.testing.assert_allclose(via[c], direct[c], rtol=1e-12, err_msg=c)
    # derived stats agree too (the re-centering algebra is exact in law)
    ev, ed = stats_eval(stats_cascade(stats_rollup(df, "1m"), "1h")), None
    ev = ev.toPandas().set_index(["series_key", "bucket_start"]).sort_index()
    ed = (
        stats_eval(stats_rollup(df, "1h"))
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    np.testing.assert_allclose(ev["slope"], ed["slope"], rtol=1e-9)
    np.testing.assert_allclose(ev["corr"], ed["corr"], rtol=1e-9)


def test_duckdb_regr_crosscheck(spark):
    duckdb = pytest.importorskip("duckdb")
    # integral seconds: Spark's micro-truncating timestamp quantization
    # is then the identity, so DuckDB sees bit-identical x values
    rng = np.random.default_rng(13)
    t = 1.7e9 + np.sort(rng.choice(6 * 3600, 800, replace=False)).astype("float64")
    pdf = pd.DataFrame(
        {
            "series_key": "a",
            "t": t,
            "value": 40.0 + 0.003 * (t - 1.7e9) + rng.normal(0, 2.0, 800),
        }
    )
    got = (
        stats_eval(stats_rollup(spark.createDataFrame(pdf), "1h"))
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pts", pdf)
    want = con.execute(
        """
        SELECT CAST(floor(t/3600)*3600 AS BIGINT) AS bucket_start,
               regr_slope(value, t - floor(t/3600)*3600) AS slope,
               regr_intercept(value, t - floor(t/3600)*3600) AS intercept,
               corr(t - floor(t/3600)*3600, value) AS corr
        FROM pts GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    assert got["bucket_start"].tolist() == want["bucket_start"].tolist()
    np.testing.assert_allclose(got["slope"], want["slope"], rtol=1e-9)
    np.testing.assert_allclose(got["intercept"], want["intercept"], rtol=1e-9)
    np.testing.assert_allclose(got["corr"], want["corr"], rtol=1e-9)


def test_exact_line_and_epoch_precision(spark):
    # exact linear series at RAW EPOCH timestamps: bucket-local centering
    # must recover the slope almost exactly — uncentered Σx² could not
    t = 1.7e9 + np.arange(0.0, 7200.0, 7.0)
    pdf = pd.DataFrame(
        {"series_key": "k", "t": t, "value": 5.0 + 0.25 * (t - 1.7e9)}
    )
    got = (
        stats_eval(stats_rollup(spark.createDataFrame(pdf), "1h"))
        .toPandas()
        .sort_values("bucket_start")
    )
    np.testing.assert_allclose(got["slope"], 0.25, rtol=1e-12)
    np.testing.assert_allclose(got["r2"], 1.0, rtol=1e-12)


def test_two_series_correlation_xcol_mode(spark):
    rng = np.random.default_rng(23)
    n = 1500
    t = 1.7e9 + np.arange(n) * 10.0
    x = rng.normal(0, 1, n)
    y = 2.0 * x + rng.normal(0, 0.5, n)
    pdf = pd.DataFrame({"series_key": "k", "t": t, "value": y, "other": x})
    got = stats_eval(
        stats_rollup(spark.createDataFrame(pdf), "1h", x_col="other")
    ).toPandas()
    merged = stats_eval(
        stats_cascade(
            stats_rollup(spark.createDataFrame(pdf), "1m", x_col="other"),
            "1h",
            recentered=False,
        )
    ).toPandas()
    for frame in (got, merged):
        frame = frame.sort_values("bucket_start").reset_index(drop=True)
        for _, row in frame.iterrows():
            lo = row["bucket_start"] - 1.7e9
            m = (np.arange(n) * 10.0 >= lo) & (np.arange(n) * 10.0 < lo + 3600)
            np.testing.assert_allclose(
                row["corr"], np.corrcoef(x[m], y[m])[0, 1], rtol=1e-9
            )


def test_single_point_and_flat_buckets_yield_nulls(spark):
    pdf = pd.DataFrame(
        {
            "series_key": ["s", "f", "f", "f"],
            "t": [10.0, 20.0, 30.0, 40.0],
            "value": [1.0, 7.0, 7.0, 7.0],
        }
    )
    got = (
        stats_eval(stats_rollup(spark.createDataFrame(pdf), "1m"))
        .toPandas()
        .set_index("series_key")
    )
    assert pd.isna(got.loc["s", "slope"]) and pd.isna(got.loc["s", "corr"])
    # flat y: slope 0, corr undefined (zero y-variance)
    assert got.loc["f", "slope"] == 0.0
    assert pd.isna(got.loc["f", "corr"])
