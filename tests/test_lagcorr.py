"""lag_corr / autocorr: ACF + lead-lag CCF over the tier grid.
Planted-period recovery, pandas autocorr parity, DuckDB self-join
oracle, shift recovery, missing-bucket semantics, plan shape."""

import math
import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.lagcorr import autocorr, lag_corr

STEP = 3600.0


@pytest.fixture(scope="module")
def tier(spark):
    """Two series on an hourly grid: s24 = 24h sinusoid (+ a deterministic
    wobble so off-period lags decorrelate), strend = noisy-ish ramp."""
    rows = []
    for b in range(240):
        t = b * 3600
        rows.append(
            ("s24", t, math.sin(2 * math.pi * b / 24) + 0.05 * math.sin(2.3 * b))
        )
        rows.append(("strend", t, 0.7 * b + 10 * math.sin(1.7 * b)))
    return spark.createDataFrame(
        rows, "series_key string, bucket_start long, value double"
    )


def test_planted_period_recovered(spark, tier):
    acf = {
        (r["series_key"], r["lag"]): r["corr"]
        for r in autocorr(tier, 36, STEP).collect()
    }
    assert acf[("s24", 24)] > 0.95  # period peak
    assert acf[("s24", 12)] < -0.95  # half-period trough
    # period = argmax over lags 2..36
    best = max((l for l in range(2, 37)), key=lambda l: acf[("s24", l)])
    assert best == 24


def test_matches_pandas_autocorr(spark, tier):
    got = {
        r["lag"]: r["corr"]
        for r in autocorr(tier, 5, STEP)
        .where("series_key = 'strend'")
        .collect()
    }
    s = pd.Series([0.7 * b + 10 * math.sin(1.7 * b) for b in range(240)])
    for lag in range(1, 6):
        assert got[lag] == pytest.approx(s.autocorr(lag), abs=1e-9)


@pytest.mark.parametrize("strategy", ["window", "join"])
def test_matches_duckdb_selfjoin(spark, tier, strategy):
    pdf = tier.toPandas()
    con = duckdb.connect()
    con.register("g", pdf)
    want = con.sql(
        """
        SELECT a.series_key, l.lag, count(*) AS n, corr(a.value, b.value) AS corr
        FROM g a
        JOIN (SELECT unnest([1, 7, 24]) AS lag) l ON true
        JOIN g b ON b.series_key = a.series_key
              AND CAST(floor(b.bucket_start/3600) AS BIGINT)
                = CAST(floor(a.bucket_start/3600) AS BIGINT) + l.lag
        GROUP BY 1, 2
        """
    ).df()
    got = lag_corr(tier, [1, 7, 24], STEP, strategy=strategy).toPandas()
    m = got.merge(want, on=["series_key", "lag"], suffixes=("_g", "_w"))
    assert len(m) == len(want) == len(got)
    assert (m["n_g"] == m["n_w"]).all()
    np.testing.assert_allclose(m["corr_g"], m["corr_w"], atol=1e-9)


@pytest.mark.parametrize("strategy", ["window", "join"])
def test_ccf_recovers_shift(spark, strategy):
    """y(t) = x(t - 3 buckets): CCF peaks (corr == 1) at lag +3."""
    xs = [math.sin(0.9 * b) + 0.3 * math.sin(2.7 * b + 1) for b in range(200)]
    x = [("k", b * 3600, xs[b]) for b in range(200)]
    y = [("k", b * 3600, xs[b - 3]) for b in range(3, 200)]
    schema = "series_key string, bucket_start long, value double"
    xdf = spark.createDataFrame(x, schema)
    ydf = spark.createDataFrame(y, schema)
    got = {
        r["lag"]: r["corr"]
        for r in lag_corr(xdf, [-3, 0, 3, 5], STEP, y=ydf, strategy=strategy).collect()
    }
    assert got[3] == pytest.approx(1.0, abs=1e-12)
    # exact-copy alignment is the unique maximum; other lags see the
    # signal's own (near-periodic, possibly large) autocorrelation
    assert all(got[l] < 1 - 1e-9 for l in (-3, 0, 5))
    assert max(got, key=got.get) == 3


def test_missing_buckets_drop_pairs(spark, tier):
    holes = tier.where("bucket_start NOT IN (36000, 72000)")  # drop buckets 10, 20
    full_n = {
        (r["series_key"], r["lag"]): r["n"]
        for r in lag_corr(tier, [1], STEP).collect()
    }
    holed = {
        (r["series_key"], r["lag"]): r["n"]
        for r in lag_corr(holes, [1], STEP).collect()
    }
    # each missing bucket breaks 2 adjacent pairs per series
    for k in full_n:
        assert holed[k] == full_n[k] - 4


def test_plan_shape(spark, tier):
    plan = (
        lag_corr(tier, [1, 2], STEP)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "Python" not in plan
    assert "HashAggregate" in plan  # moment sums, map-side partials
    # window strategy: NO join anywhere — one sort serves every lag
    assert "Join" not in plan
    assert len(re.findall(r"^\s*[+\-:* ]*Window\b", plan, re.M)) == 1


def test_validation(spark, tier):
    with pytest.raises(ValueError):
        lag_corr(tier, [], STEP)
    with pytest.raises(ValueError):
        autocorr(tier, 0, STEP)
