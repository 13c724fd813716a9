"""scipy-free nearest / Akima / PCHIP interpolation.

The reference's gap corrector forwards its ``method`` knob to
``pandas.DataFrame.interpolate`` (reference
``scripts/discontinuity_utils.py:144-163``; the documented surface at
``scripts/processor.py:298-300`` names 'linear', 'time', 'spline',
'polynomial', 'akima'), and pandas in turn delegates every non-linear
method to scipy. scipy is an optional dependency this engine does not
require, so the three most useful members are implemented here directly,
each mirroring the precise algorithm pandas would run:

- ``nearest`` — ``interp1d(kind='nearest')``: midpoint thresholds with
  ties rounding DOWN (searchsorted side='left' on bin midpoints), NaN
  outside the valid span.
- ``akima`` — ``Akima1DInterpolator``: Akima '70 weighted-slope rule with
  the two-slope linear extension at each edge and the equal-weights
  average fallback, NaN outside the valid span (scipy's Akima does not
  extrapolate by default).
- ``pchip`` — ``PchipInterpolator``: Fritsch–Carlson monotone Hermite
  (weighted harmonic-mean interior slopes zeroed at sign changes,
  one-sided three-point edge slopes with the sign/3× clamps), and —
  unlike the other methods — EXTRAPOLATED beyond the span, because
  pandas' pchip wrapper evaluates scipy's PPoly with its default
  ``extrapolate=True``.

The cubic members evaluate through the same vectorized Hermite form as
``functions/spline.py``; everything here is O(n) numpy with no Python
loop, safe inside Arrow batches on executors.

See also ``functions/spline.py`` (not-a-knot cubic — pandas 'cubic').
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "nearest_eval",
    "akima_eval",
    "pchip_eval",
    "locf_eval",
    "interp_fill",
]


def locf_eval(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Last-observation-carried-forward: value of the greatest ``x`` ≤
    each query (an ENGINE EXTENSION — TimescaleDB ``locf``; not a pandas
    interpolate method, which only offers the deprecated 'pad'). Queries
    before the first observation BACKFILL from it, keeping the kernel's
    'both edges filled' convention (linear's ``limit_direction='both'``,
    so ``correct_series(gap_method='locf')`` never emits NaN rows)."""
    idx = np.searchsorted(x, xq, side="right") - 1
    return y[np.maximum(idx, 0)]


def _check_xy(x: np.ndarray, y: np.ndarray, min_pts: int, what: str):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if len(x) < min_pts:
        raise ValueError(f"{what} requires at least {min_pts} points")
    if np.any(np.diff(x) <= 0):
        raise ValueError("x must be strictly increasing")
    return x, y


def nearest_eval(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """``interp1d(kind='nearest')``: nearest-knot value, midpoint ties to
    the LEFT knot, NaN outside ``[x[0], x[-1]]``."""
    x, y = _check_xy(x, y, 2, "nearest interpolation")
    xq = np.asarray(xq, dtype=np.float64)
    mid = (x[1:] + x[:-1]) / 2.0
    out = y[np.searchsorted(mid, xq, side="left")]
    out[(xq < x[0]) | (xq > x[-1])] = np.nan
    return out


def _hermite_eval(
    x: np.ndarray,
    y: np.ndarray,
    s: np.ndarray,
    xq: np.ndarray,
    extrapolate: bool,
) -> np.ndarray:
    """Evaluate the C1 cubic Hermite spline with knot slopes ``s``."""
    h = np.diff(x)
    slope = np.diff(y) / h
    idx = np.clip(np.searchsorted(x, xq, side="right") - 1, 0, len(x) - 2)
    dx = xq - x[idx]
    hi = h[idx]
    si = s[idx]
    si1 = s[idx + 1]
    sl = slope[idx]
    c2 = (3.0 * sl - 2.0 * si - si1) / hi
    c3 = (si + si1 - 2.0 * sl) / (hi * hi)
    out = y[idx] + dx * (si + dx * (c2 + dx * c3))
    if not extrapolate:
        out[(xq < x[0]) | (xq > x[-1])] = np.nan
    return out


def akima_eval(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Akima 1970 interpolant, matching ``scipy.interpolate
    .Akima1DInterpolator`` (the backend of pandas ``method='akima'``).

    Knot slope: t_i = (|s_{i+1}-s_i|·s_{i-1} + |s_{i-1}-s_{i-2}|·s_i)
    / (|s_{i+1}-s_i| + |s_{i-1}-s_{i-2}|) over interval slopes s, with the
    two-slope linear extension s_{-1} = 2·s_0 − s_1 (etc.) supplying the
    out-of-range slopes and the plain average (s_{i-1}+s_i)/2 where the
    denominator vanishes (scipy's 1e-9·max threshold). NaN outside the
    span — scipy's Akima does not extrapolate."""
    x, y = _check_xy(x, y, 3, "akima interpolation")
    xq = np.asarray(xq, dtype=np.float64)
    n = len(x)
    # interval slopes padded with two linear-extension slopes per side
    m = np.empty(n + 3)
    m[2:-2] = np.diff(y) / np.diff(x)
    m[1] = 2.0 * m[2] - m[3]
    m[0] = 2.0 * m[1] - m[2]
    m[-2] = 2.0 * m[-3] - m[-4]
    m[-1] = 2.0 * m[-2] - m[-3]

    dm = np.abs(np.diff(m))
    f1 = dm[2:]  # |s_{i+1} - s_i|
    f2 = dm[:-2]  # |s_{i-1} - s_{i-2}|
    f12 = f1 + f2
    s = (m[1:-2] + m[2:-1]) / 2.0  # fallback: average of adjacent slopes
    ind = f12 > 1e-9 * np.max(f12, initial=0.0)
    s[ind] = (f1[ind] * m[1:-2][ind] + f2[ind] * m[2:-1][ind]) / f12[ind]
    return _hermite_eval(x, y, s, xq, extrapolate=False)


def pchip_eval(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Fritsch–Carlson monotone cubic Hermite, matching
    ``scipy.interpolate.PchipInterpolator`` (the backend of pandas
    ``method='pchip'``) including its edge-slope clamps and its default
    ``extrapolate=True`` evaluation."""
    x, y = _check_xy(x, y, 2, "pchip interpolation")
    xq = np.asarray(xq, dtype=np.float64)
    h = np.diff(x)
    mk = np.diff(y) / h
    if len(x) == 2:
        s = np.array([mk[0], mk[0]])
        return _hermite_eval(x, y, s, xq, extrapolate=True)

    s = np.zeros(len(x))
    # interior: weighted harmonic mean where neighbor slopes share a sign
    # and neither is zero; 0 otherwise (enforces monotonicity)
    smk = np.sign(mk)
    keep = (smk[1:] == smk[:-1]) & (mk[1:] != 0) & (mk[:-1] != 0)
    w1 = 2.0 * h[1:] + h[:-1]
    w2 = h[1:] + 2.0 * h[:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        hm = (w1 + w2) / (w1 / np.where(mk[:-1] == 0, np.nan, mk[:-1])
                          + w2 / np.where(mk[1:] == 0, np.nan, mk[1:]))
    s[1:-1] = np.where(keep, hm, 0.0)

    def edge(h0, h1, m0, m1):
        d = ((2.0 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        if np.sign(d) != np.sign(m0):
            return 0.0
        if np.sign(m0) != np.sign(m1) and abs(d) > 3.0 * abs(m0):
            return 3.0 * m0
        return d

    s[0] = edge(h[0], h[1], mk[0], mk[1])
    s[-1] = edge(h[-1], h[-2], mk[-1], mk[-2])
    return _hermite_eval(x, y, s, xq, extrapolate=True)


_FILL_FNS = {"nearest": nearest_eval, "akima": akima_eval, "pchip": pchip_eval, "locf": locf_eval}
_MIN_PTS = {"nearest": 2, "akima": 3, "pchip": 2, "locf": 1}


def interp_fill(values: np.ndarray, method: str) -> np.ndarray:
    """Fill NaNs in ``values`` by interpolating over the positional index —
    what ``Series.interpolate(method=...)`` computes on a RangeIndex frame.
    For 'nearest'/'akima', positions outside the valid span stay NaN; for
    'pchip', they extrapolate (pandas' behaviors, respectively). Returns a
    new array."""
    fn = _FILL_FNS[method]
    values = np.asarray(values, dtype=np.float64)
    invalid = np.isnan(values)
    if not invalid.any():
        return values.copy()
    valid_pos = np.flatnonzero(~invalid).astype(np.float64)
    if len(valid_pos) < _MIN_PTS[method]:
        raise ValueError(
            f"{method} gap interpolation requires at least "
            f"{_MIN_PTS[method]} non-NaN points"
        )
    out = values.copy()
    query_pos = np.flatnonzero(invalid).astype(np.float64)
    out[invalid] = fn(valid_pos, values[~invalid], query_pos)
    return out
