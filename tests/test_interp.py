"""nearest / Akima / PCHIP interpolation (functions/interp.py).

Each mirrors the scipy algorithm pandas delegates to (reference
``scripts/discontinuity_utils.py:144-163`` forwards the method knob to
pandas); scipy-gated parity tests pin equivalence where scipy exists, and
scipy-free checks pin the defining properties: tie direction for nearest,
Akima's slope rule against an independent scalar transcription, and
Fritsch–Carlson monotonicity for pchip.
"""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.functions.interp import (
    akima_eval,
    interp_fill,
    nearest_eval,
    pchip_eval,
)
from series_correction_project_updated_spark.oracle import correction as oracle


# --- nearest ---------------------------------------------------------------


def test_nearest_golden_and_ties():
    x = np.array([0.0, 1.0, 3.0])
    y = np.array([10.0, 20.0, 30.0])
    q = np.array([0.4, 0.5, 0.6, 1.9, 2.0, 2.1, -0.1, 3.1])
    got = nearest_eval(x, y, q)
    # midpoint ties round DOWN (interp1d searchsorted side='left' on
    # bin midpoints): 0.5 -> y0, 2.0 -> y1
    np.testing.assert_array_equal(got[:6], [10.0, 10.0, 20.0, 20.0, 20.0, 30.0])
    assert np.isnan(got[6:]).all()


# --- akima -----------------------------------------------------------------


def _akima_scalar(x, y, xq):
    """Independent scalar transcription of Akima 1970 for cross-checking
    the vectorized implementation."""
    n = len(x)
    s = [(y[i + 1] - y[i]) / (x[i + 1] - x[i]) for i in range(n - 1)]
    s = [3 * s[0] - 2 * s[1], 2 * s[0] - s[1]] + s + [2 * s[-1] - s[-2], 3 * s[-1] - 2 * s[-2]]
    # s[k+2] is interval slope k; recompute pads exactly as the extension
    s[1] = 2 * s[2] - s[3]
    s[0] = 2 * s[1] - s[2]
    s[-2] = 2 * s[-3] - s[-4]
    s[-1] = 2 * s[-2] - s[-3]
    t = []
    f12max = max(
        abs(s[i + 3] - s[i + 2]) + abs(s[i + 1] - s[i]) for i in range(n)
    )
    for i in range(n):
        f1 = abs(s[i + 3] - s[i + 2])
        f2 = abs(s[i + 1] - s[i])
        if f1 + f2 > 1e-9 * f12max:
            t.append((f1 * s[i + 1] + f2 * s[i + 2]) / (f1 + f2))
        else:
            t.append((s[i + 1] + s[i + 2]) / 2.0)
    out = []
    for q in xq:
        if q < x[0] or q > x[-1]:
            out.append(np.nan)
            continue
        i = min(np.searchsorted(x, q, side="right") - 1, n - 2)
        i = max(i, 0)
        h = x[i + 1] - x[i]
        sl = (y[i + 1] - y[i]) / h
        d = q - x[i]
        c2 = (3 * sl - 2 * t[i] - t[i + 1]) / h
        c3 = (t[i] + t[i + 1] - 2 * sl) / h**2
        out.append(y[i] + d * (t[i] + d * (c2 + d * c3)))
    return np.array(out)


def test_akima_matches_independent_scalar():
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 10, 11))
    y = rng.normal(size=11) * 5
    xq = np.sort(rng.uniform(x[0], x[-1], 100))
    np.testing.assert_allclose(akima_eval(x, y, xq), _akima_scalar(x, y, xq), atol=1e-10)


def test_akima_linear_knots_oob():
    x = np.array([0.0, 1.0, 2.5, 4.0, 7.0])
    y = 3.0 * x - 1.0
    xq = np.linspace(0, 7, 50)
    np.testing.assert_allclose(akima_eval(x, y, xq), 3.0 * xq - 1.0, atol=1e-10)
    yr = np.array([1.0, -2.0, 5.0, 0.0, 3.0])
    np.testing.assert_allclose(akima_eval(x, yr, x), yr, atol=1e-12)
    assert np.isnan(akima_eval(x, yr, np.array([-0.1, 7.1]))).all()


def test_akima_flat_fallback():
    """Equal slopes everywhere → the 0/0 fallback averages, staying exact
    on constant data."""
    x = np.arange(6.0)
    y = np.full(6, 2.5)
    np.testing.assert_array_equal(akima_eval(x, y, np.linspace(0, 5, 21)), 2.5)


# --- pchip -----------------------------------------------------------------


def test_pchip_monotone_no_overshoot():
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.array([0.0, 0.1, 0.2, 5.0, 5.1, 5.2])  # steep middle step
    xq = np.linspace(0, 5, 501)
    got = pchip_eval(x, y, xq)
    assert np.all(np.diff(got) >= -1e-12)  # monotone, no overshoot
    assert got.min() >= -1e-12 and got.max() <= 5.2 + 1e-12


def test_pchip_linear_knots_extrapolation():
    x = np.array([0.0, 2.0, 3.0, 7.0])
    y = 2.0 * x + 1.0
    xq = np.linspace(-1, 8, 40)  # includes out-of-span points
    got = pchip_eval(x, y, xq)
    # pchip EXTRAPOLATES (pandas evaluates scipy's PPoly with its default
    # extrapolate=True) — linear data stays linear even outside the span
    np.testing.assert_allclose(got, 2.0 * xq + 1.0, atol=1e-10)
    yr = np.array([1.0, 0.0, 4.0, 2.0])
    np.testing.assert_allclose(pchip_eval(x, yr, x), yr, atol=1e-12)


def test_pchip_zero_slope_at_sign_change():
    x = np.arange(5.0)
    y = np.array([0.0, 2.0, 1.0, 3.0, 4.0])  # slope sign flips at knots 1,2
    eps = 1e-7
    for xk in (1.0, 2.0):
        d = (pchip_eval(x, y, np.array([xk + eps])) - pchip_eval(x, y, np.array([xk - eps]))) / (2 * eps)
        assert abs(d[0]) < 1e-4


def test_pchip_two_points_is_linear():
    got = pchip_eval(np.array([0.0, 4.0]), np.array([1.0, 9.0]), np.array([1.0, 2.0, 5.0]))
    np.testing.assert_allclose(got, [3.0, 5.0, 11.0], atol=1e-12)


# --- fill + validation -----------------------------------------------------


def test_interp_fill_edge_semantics():
    v = np.array([np.nan, 1.0, 4.0, np.nan, 2.0, 5.0, np.nan])
    for method in ("nearest", "akima"):
        out = interp_fill(v, method)
        assert np.isnan(out[0]) and np.isnan(out[-1])
        assert np.isfinite(out[3])
    out = interp_fill(v, "pchip")
    assert np.isfinite(out).all()  # pchip extrapolates the edges


def test_interp_fill_min_points():
    with pytest.raises(ValueError, match="at least 3"):
        interp_fill(np.array([1.0, np.nan, 2.0]), "akima")
    with pytest.raises(ValueError, match="at least 2"):
        interp_fill(np.array([1.0, np.nan, np.nan]), "pchip")


def test_strictly_increasing_required():
    x = np.array([0.0, 2.0, 1.0, 3.0])
    with pytest.raises(ValueError, match="strictly increasing"):
        akima_eval(x, x, x)


# --- scipy parity (skipped in this container) ------------------------------


def test_scipy_parity_all_methods():
    scipy_interp = pytest.importorskip("scipy.interpolate")
    rng = np.random.default_rng(13)
    x = np.sort(rng.uniform(0, 50, 25))
    y = rng.normal(size=25) * 4
    xq = np.sort(rng.uniform(x[0], x[-1], 300))
    np.testing.assert_allclose(
        nearest_eval(x, y, xq),
        scipy_interp.interp1d(x, y, kind="nearest", bounds_error=False)(xq),
        atol=0,
    )
    np.testing.assert_allclose(
        akima_eval(x, y, xq), scipy_interp.Akima1DInterpolator(x, y)(xq), atol=1e-9
    )
    xq_ext = np.concatenate([[x[0] - 3.0], xq, [x[-1] + 3.0]])
    np.testing.assert_allclose(
        pchip_eval(x, y, xq_ext),
        scipy_interp.PchipInterpolator(x, y)(xq_ext),
        atol=1e-9,
    )


# --- through correct_gaps --------------------------------------------------


@pytest.mark.parametrize("method", ["nearest", "akima", "pchip"])
def test_correct_gaps_method(method):
    t = np.array([0.0, 1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 13.0])
    v = np.sin(t)
    df = pd.DataFrame({"t": t, "value": v})
    diffs = np.diff(t)
    gaps = [int(np.flatnonzero(diffs > 3 * np.median(diffs))[0]) + 1]
    out = oracle.correct_gaps(df, gaps, "t", ["value"], method=method)
    assert len(out) > len(df)
    orig = out[out["t"].isin(t)].sort_values("t")
    np.testing.assert_allclose(orig["value"].to_numpy(), v, atol=1e-12)
    inserted = out[~out["t"].isin(t)]
    assert inserted["value"].notna().all()
    merged_v = out["value"].to_numpy().copy()
    merged_v[~out["t"].isin(t).to_numpy()] = np.nan
    np.testing.assert_allclose(
        out["value"].to_numpy(), interp_fill(merged_v, method), atol=1e-12
    )


# ----------------------------------------------------------------- LOCF


def test_locf_eval_semantics():
    from series_correction_project_updated_spark.functions.interp import locf_eval

    x = np.array([2.0, 5.0, 9.0])
    y = np.array([10.0, 20.0, 30.0])
    xq = np.array([0.0, 2.0, 3.0, 5.0, 8.9, 9.0, 12.0])
    got = locf_eval(x, y, xq)
    #   before first -> backfill; at knot -> knot; between -> previous
    np.testing.assert_array_equal(got, [10.0, 10.0, 10.0, 20.0, 20.0, 30.0, 30.0])


def test_locf_fill_matches_pandas_ffill_bfill():
    from series_correction_project_updated_spark.functions.interp import interp_fill

    rng = np.random.default_rng(31)
    v = rng.normal(size=300)
    v[rng.random(300) < 0.3] = np.nan
    v[:3] = np.nan  # leading edge exercises the backfill convention
    got = interp_fill(v, "locf")
    want = pd.Series(v).ffill().bfill().to_numpy()
    np.testing.assert_array_equal(got, want)


def test_locf_single_point_fills_everything():
    from series_correction_project_updated_spark.functions.interp import interp_fill

    v = np.array([np.nan, np.nan, 7.0, np.nan])
    np.testing.assert_array_equal(interp_fill(v, "locf"), np.full(4, 7.0))


def test_spark_kernel_end_to_end_locf(spark):
    """gap_method='locf' flows through the distributed kernel: inserted
    gap rows carry the value of the last pre-gap observation."""
    from series_correction_project_updated_spark.operators.correct import correct_series

    rng = np.random.default_rng(29)
    rows = []
    for key in ("u1", "u2"):
        t = np.cumsum(rng.integers(1, 4, size=60)).astype(float)
        t[30:] += 50.0
        rows.append(pd.DataFrame({"series_key": key, "t": t, "value": rng.normal(size=60)}))
    pdf = pd.concat(rows, ignore_index=True)
    cfg = {"gap_method": "locf"}
    got = (
        correct_series(spark.createDataFrame(pdf), config=cfg)
        .orderBy("series_key", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    outs = []
    for key, grp in pdf.groupby("series_key"):
        out = oracle.process_series(grp[["t", "value"]], "t", "value", cfg)
        out.insert(0, "series_key", key)
        outs.append(out)
    want = pd.concat(outs).sort_values(["series_key", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the inserted rows equal the last observation before each gap
    for key, grp in pdf.groupby("series_key"):
        sub = got[got["series_key"] == key]
        inserted = sub[~sub["t"].isin(grp["t"])]
        assert len(inserted) > 0
        for _, r in inserted.iterrows():
            before = grp[grp["t"] < r["t"]].sort_values("t")
            # kernel corrections may shift values; compare against the
            # CORRECTED pre-gap value from the same output
            prev_out = sub[(sub["t"] < r["t"]) & sub["t"].isin(grp["t"])].sort_values("t")
            assert r["value"] == prev_out["value"].iloc[-1]
