"""Exponentially-weighted smoothing and one-step-ahead anomaly scores.

EWMA is the classic streaming smoother (pandas ``ewm(adjust=False)``,
Prometheus ``holt_winters``'s level term): ``y_i = (1-α)·y_{i-1} + α·x_i``.
The recurrence is sequential per series, but it is LINEAR, so it
vectorizes exactly: within a block, ``s_i = c^{i+1}·carry +
c^i·Σ_j z_j c^{-j}`` — one ``cumsum`` per block, with the block size
chosen so ``c^{-B}`` stays finite (the same carry-seeded block-scan
pattern as the kernel's CUSUM). The EWM variance shares the shape: with
the mean known, ``v_i = c·v_{i-1} + c·α·(x_i - y_{i-1})²`` is another
linear recurrence with known inputs. Both match pandas
``ewm(alpha, adjust=False).mean()`` / ``.var(bias=True)`` to ~1e-14
relative (test-pinned).

``ewm_z`` is the one-step-ahead standardized innovation
``(x_i - y_{i-1}) / sqrt(v_{i-1})`` — the natural streaming anomaly
score (how surprising is this point given the smoothed past), null
until the variance warms up.

Execution shape: the kernel's standard one-hash-repartition +
``mapInPandas`` streaming whole partitions; per series one numpy block
scan (no per-row Python). Null values pass through with null outputs
and do not perturb the smoother state. Not SQL-expressible (infinite
exponential memory), so pandas is the test oracle; the 50-entry driver
registry is full.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lin_rec_blocked(z: np.ndarray, c: float, s0: float) -> np.ndarray:
    """s_i = c*s_{i-1} + z_i with s_{-1} = s0, exact blocked scan."""
    n = len(z)
    out = np.empty(n)
    if n == 0:
        return out
    if c == 0.0:
        out[:] = z
        return out
    # c^{-B} must stay finite: B ~ 600/-ln(c) keeps it under ~e^600
    B = 4096 if c >= 1.0 else max(16, min(4096, int(600.0 / -np.log(c))))
    carry = s0
    for st in range(0, n, B):
        blk = z[st : st + B]
        m = len(blk)
        ci = c ** np.arange(m, dtype=np.float64)
        s = c * ci * carry + ci * np.cumsum(blk / ci)
        out[st : st + m] = s
        carry = s[-1]
    return out


def ewm_mean_var(x: np.ndarray, alpha: float) -> tuple[np.ndarray, np.ndarray]:
    """(mean, biased var) per pandas ``ewm(alpha, adjust=False)``."""
    n = len(x)
    y = np.empty(n)
    v = np.zeros(n)
    if n == 0:
        return y, v
    c = 1.0 - alpha
    y[0] = x[0]
    if n > 1:
        y[1:] = _lin_rec_blocked(alpha * x[1:], c, x[0])
        diff = x[1:] - y[:-1]
        v[1:] = _lin_rec_blocked(c * alpha * diff * diff, c, 0.0)
    return y, v


def _lin_rec_blocked_c(z: np.ndarray, c: complex, s0: complex) -> np.ndarray:
    """Complex variant of the blocked scan (block bound from |c|)."""
    n = len(z)
    out = np.empty(n, dtype=complex)
    if n == 0:
        return out
    if c == 0:
        out[:] = z
        return out
    mag = abs(c)
    B = 4096 if mag >= 1.0 else max(16, min(4096, int(600.0 / -np.log(mag))))
    carry = s0
    for st in range(0, n, B):
        blk = z[st : st + B]
        m = len(blk)
        ci = c ** np.arange(m)
        s = c * ci * carry + ci * np.cumsum(blk / ci)
        out[st : st + m] = s
        carry = s[-1]
    return out


def holt_scalar(x: np.ndarray, alpha: float, beta: float):
    """Reference scalar Holt recurrence (l_0 = x_0, t_0 = 0) — the
    oracle the vectorized path is property-tested against, and the
    fallback when the transition matrix is (near-)defective."""
    n = len(x)
    level = np.empty(n)
    trend = np.empty(n)
    if n == 0:
        return level, trend
    level[0], trend[0] = x[0], 0.0
    for i in range(1, n):
        level[i] = alpha * x[i] + (1 - alpha) * (level[i - 1] + trend[i - 1])
        trend[i] = beta * (level[i] - level[i - 1]) + (1 - beta) * trend[i - 1]
    return level, trend


def holt_level_trend(x: np.ndarray, alpha: float, beta: float):
    """Holt double-exponential smoothing, vectorized.

    The coupled (level, trend) update is one LINEAR state recurrence
    ``s_i = M s_{i-1} + c x_i`` with constant 2x2 ``M``; diagonalizing
    ``M = P D P^-1`` decouples it into two independent scalar
    recurrences with the (generally complex-conjugate) eigenvalues —
    each just a complex blocked scan. Stable for α∈(0,1], β∈[0,1]
    (|λ|² = 1-α). Matches the scalar recurrence to ~1e-13 of the level
    scale (test-pinned); falls back to the scalar loop on a (near-)
    defective ``M`` (measure-zero parameter curve).
    """
    n = len(x)
    if n <= 1:
        return holt_scalar(x, alpha, beta)
    M = np.array([[1 - alpha, 1 - alpha], [-alpha * beta, 1 - alpha * beta]])
    cvec = np.array([alpha, alpha * beta])
    lam, P = np.linalg.eig(M)
    if abs(lam[0] - lam[1]) < 1e-6 * max(1.0, abs(lam[0])):
        return holt_scalar(x, alpha, beta)
    Pinv = np.linalg.inv(P)
    g = Pinv @ cvec
    u0 = Pinv @ np.array([x[0], 0.0])
    xs = x[1:]
    u = np.empty((2, n - 1), dtype=complex)
    for k in range(2):
        u[k] = _lin_rec_blocked_c(g[k] * xs, lam[k], u0[k])
    s = (P @ u).real
    return (
        np.concatenate(([x[0]], s[0])),
        np.concatenate(([0.0], s[1])),
    )


def holt_smooth(
    points: DataFrame,
    alpha: float,
    beta: float,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-series Holt level+trend: adds ``level``, ``trend``, ``yhat``
    (the one-step-ahead forecast ``l_{i-1} + t_{i-1}``, null on each
    series' first point — residual ``value - yhat`` is the forecast
    error stream). Same one-shuffle mapInPandas shape as
    ``ewma_smooth``; null values pass through with null outputs."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    if num_partitions is None:
        num_partitions = points.sparkSession.sparkContext.defaultParallelism * 2

    cols = [key_col, time_col, value_col]
    out_schema = T.StructType(
        [points.schema[c] for c in cols]
        + [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("yhat", T.DoubleType()),
        ]
    )

    def _run(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values([key_col, time_col])
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        lv = np.full(len(pdf), np.nan)
        tr = np.full(len(pdf), np.nan)
        yh = np.full(len(pdf), np.nan)
        keys = pdf[key_col].to_numpy()
        bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        for s, e in zip(
            np.concatenate(([0], bounds)), np.concatenate((bounds, [len(pdf)]))
        ):
            x = vals[s:e]
            ok = ~np.isnan(x)
            xi = x[ok]
            if len(xi) == 0:
                continue
            level, trend = holt_level_trend(xi, alpha, beta)
            fc = np.full(len(xi), np.nan)
            fc[1:] = level[:-1] + trend[:-1]
            idx = np.flatnonzero(ok) + s
            lv[idx] = level
            tr[idx] = trend
            yh[idx] = fc
        pdf = pdf.assign(level=lv, trend=tr, yhat=yh)
        yield pdf[cols + ["level", "trend", "yhat"]]

    return (
        points.select(*cols)
        .repartition(num_partitions, key_col)
        .mapInPandas(_run, schema=out_schema)
    )


def ewma_smooth(
    points: DataFrame,
    alpha: float,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-series EWM smoothing: adds ``ewma``, ``ewm_std``, ``ewm_z``.

    Rows keep their (key, t, value); null values get null outputs and
    are invisible to the smoother state. ``ewm_z`` is null while
    ``sqrt(v_{i-1}) < 1e-12`` (variance not warmed up / constant run).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if num_partitions is None:
        num_partitions = points.sparkSession.sparkContext.defaultParallelism * 2

    cols = [key_col, time_col, value_col]
    out_schema = T.StructType(
        [points.schema[c] for c in cols]
        + [
            T.StructField("ewma", T.DoubleType()),
            T.StructField("ewm_std", T.DoubleType()),
            T.StructField("ewm_z", T.DoubleType()),
        ]
    )

    def _run(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values([key_col, time_col])
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        ew = np.full(len(pdf), np.nan)
        st = np.full(len(pdf), np.nan)
        zs = np.full(len(pdf), np.nan)
        start = 0
        keys = pdf[key_col].to_numpy()
        bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        for s, e in zip(
            np.concatenate(([0], bounds)), np.concatenate((bounds, [len(pdf)]))
        ):
            x = vals[s:e]
            ok = ~np.isnan(x)
            xi = x[ok]
            if len(xi) == 0:
                continue
            y, v = ewm_mean_var(xi, alpha)
            sd = np.sqrt(v)
            z = np.full(len(xi), np.nan)
            if len(xi) > 1:
                prev_sd = sd[:-1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    z[1:] = np.where(
                        prev_sd >= 1e-12, (xi[1:] - y[:-1]) / prev_sd, np.nan
                    )
            idx = np.flatnonzero(ok) + s
            ew[idx] = y
            st[idx] = sd
            zs[idx] = z
        pdf = pdf.assign(ewma=ew, ewm_std=st, ewm_z=zs)
        yield pdf[cols + ["ewma", "ewm_std", "ewm_z"]]

    return (
        points.select(*cols)
        .repartition(num_partitions, key_col)
        .mapInPandas(_run, schema=out_schema)
    )


def ewma_holt_smooth(
    points: DataFrame,
    alpha: float,
    beta: float,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """EWMA and Holt smoothing FUSED into one kernel pass (r6 optimization):
    one scan, one shuffle, one per-partition sort and one Arrow boundary
    instead of two of each — the union ``ewma_smooth(pts) ∪ holt_smooth(pts)``
    with a discriminator column, row-for-row identical (pinned by
    tests/test_smooth.py::test_fused_equals_union).

    Output: (op, key, t, value, m1, m2, m3) where op='ewm' carries
    (ewma, ewm_std, ewm_z) and op='holt' carries (level, trend, yhat) in
    m1..m3. Per-series math is the SAME code paths (``ewm_mean_var``,
    ``holt_level_trend``) as the standalone operators.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    if num_partitions is None:
        num_partitions = points.sparkSession.sparkContext.defaultParallelism * 2

    cols = [key_col, time_col, value_col]
    out_schema = T.StructType(
        [T.StructField("op", T.StringType())]
        + [points.schema[c] for c in cols]
        + [
            T.StructField("m1", T.DoubleType()),
            T.StructField("m2", T.DoubleType()),
            T.StructField("m3", T.DoubleType()),
        ]
    )

    def _run(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values([key_col, time_col])
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        ew = np.full(n, np.nan)
        st = np.full(n, np.nan)
        zs = np.full(n, np.nan)
        lv = np.full(n, np.nan)
        tr = np.full(n, np.nan)
        yh = np.full(n, np.nan)
        keys = pdf[key_col].to_numpy()
        bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        for s, e in zip(
            np.concatenate(([0], bounds)), np.concatenate((bounds, [n]))
        ):
            x = vals[s:e]
            ok = ~np.isnan(x)
            xi = x[ok]
            if len(xi) == 0:
                continue
            idx = np.flatnonzero(ok) + s
            y, v = ewm_mean_var(xi, alpha)
            sd = np.sqrt(v)
            z = np.full(len(xi), np.nan)
            if len(xi) > 1:
                prev_sd = sd[:-1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    z[1:] = np.where(
                        prev_sd >= 1e-12, (xi[1:] - y[:-1]) / prev_sd, np.nan
                    )
            ew[idx] = y
            st[idx] = sd
            zs[idx] = z
            level, trend = holt_level_trend(xi, alpha, beta)
            fc = np.full(len(xi), np.nan)
            fc[1:] = level[:-1] + trend[:-1]
            lv[idx] = level
            tr[idx] = trend
            yh[idx] = fc
        base = pdf[cols]
        yield pd.concat(
            [
                base.assign(op="ewm", m1=ew, m2=st, m3=zs),
                base.assign(op="holt", m1=lv, m2=tr, m3=yh),
            ],
            ignore_index=True,
        )[["op"] + cols + ["m1", "m2", "m3"]]

    return (
        points.select(*cols)
        .repartition(num_partitions, key_col)
        .mapInPandas(_run, schema=out_schema)
    )


def holt_forecast(
    points: DataFrame,
    alpha: float,
    beta: float,
    horizon: int,
    step: float,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Project each series ``horizon`` steps past its last observation:
    Holt's linear-trend forecast ``yhat_{T+k} = l_T + k·t_T`` on the
    grid ``t_T + k·step`` (the standard h-step rule, e.g. Hyndman &
    Athanasopoulos, *Forecasting: Principles and Practice* §8.2 — the
    reference repo stops at smoothing; forecasting is additive surface).

    Output: (key, t, k, yhat) — ``k`` in 1..horizon, one row per future
    bucket, composable with the real tier for forecast-vs-actual joins
    (the ``yhat`` residual stream ``holt_smooth`` serves in-sample).

    Scale shape: ``holt_smooth``'s one shuffle + Arrow pass, then a
    per-key ``max(struct(t, level, trend))`` hash aggregate (map-side
    partials reuse the smoother's key clustering) and a width-``horizon``
    ``sequence`` explode of the 1-row-per-key frontier — the expensive
    part scales with points, the generate with keys × horizon, and
    nothing is driver-side. Under duplicate last timestamps the struct
    max tiebreaks on (level, trend) deterministically; feed a tier grid
    (unique (key, bucket)) for well-defined semantics.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    if step <= 0:
        raise ValueError(f"step must be > 0, got {step}")
    sm = holt_smooth(
        points,
        alpha,
        beta,
        key_col=key_col,
        time_col=time_col,
        value_col=value_col,
        num_partitions=num_partitions,
    )
    frontier = (
        sm.where(F.col("level").isNotNull())
        .groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.col(time_col).cast("double").alias("t"),
                    F.col("level").alias("level"),
                    F.col("trend").alias("trend"),
                )
            ).alias("_s")
        )
    )
    k = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("k")
    last = F.col("_s")
    return frontier.select(key_col, k, "_s").select(
        key_col,
        (last["t"] + F.col("k").cast("double") * F.lit(float(step))).alias(time_col),
        "k",
        (last["level"] + F.col("k").cast("double") * last["trend"]).alias("yhat"),
    )
