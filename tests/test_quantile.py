"""Mergeable quantile-digest tiers: kernel laws (flat vectorized ==
scalar reference, exact-small, rank-error bound) and the Spark tier
surface (determinism across partitionings, cascade bit-equality when
buckets fit, no-raw-re-scan series percentiles, one-shuffle plan)."""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.quantile import (
    _compress_flat,
    _compress_scalar,
    _quantiles_flat,
    digest_quantiles,
    quantile_cascade,
    quantile_rollup,
    series_quantiles,
)
from series_correction_project_updated_spark.sources.synth import (
    generate_pages,
    pages_to_series,
)

QS = [0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


# ------------------------------------------------------------- kernels


def test_compress_flat_matches_scalar_reference():
    rng = np.random.default_rng(7)
    for trial in range(60):
        R = int(rng.integers(1, 8))
        k = int(rng.integers(4, 40))
        rows_v, rows_w = [], []
        for _ in range(R):
            n = int(rng.integers(1, 200))
            # round to force value ties; mixed unit/integer weights
            v = np.round(rng.normal(0, 10, n), int(rng.integers(0, 3)))
            w = (
                rng.integers(1, 5, n).astype(float)
                if rng.random() < 0.5
                else np.ones(n)
            )
            rows_v.append(v)
            rows_w.append(w)
        lengths = np.array([len(v) for v in rows_v])
        mv, mw = _compress_flat(
            np.concatenate(rows_v), np.concatenate(rows_w), lengths, k
        )
        for i in range(R):
            sv, sw = _compress_scalar(rows_v[i], rows_w[i], k)
            np.testing.assert_array_equal(mv[i], sv, err_msg=f"trial {trial} row {i}")
            np.testing.assert_array_equal(mw[i], sw)
            assert len(mv[i]) <= k


def test_exact_small_law_matches_numpy_linear():
    """n <= k: the digest is the sorted sample and every quantile equals
    numpy's linear-interpolation quantile exactly."""
    rng = np.random.default_rng(11)
    for _ in range(40):
        n = int(rng.integers(1, 64))
        v = np.round(rng.normal(0, 5, n), 1)
        sv, sw = _compress_scalar(v, np.ones(n), 64)
        qs = np.array([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
        est = _quantiles_flat(
            sv,
            sw,
            np.array([len(sv)]),
            np.array([float(n)]),
            np.array([v.min()]),
            np.array([v.max()]),
            qs,
        )[0]
        np.testing.assert_allclose(est, np.quantile(v, qs), atol=1e-12, rtol=0)


def test_rank_error_bound_large_n():
    """n >> k: estimated value's rank within the true data stays within
    3/k of the requested quantile (equal-weight bins hold ~n/k ranks;
    interpolation spans at most two adjacent bins)."""
    rng = np.random.default_rng(13)
    k = 64
    for dist in ("lognormal", "normal", "uniform"):
        v = getattr(rng, dist)(size=20000) if dist != "lognormal" else rng.lognormal(0, 1, 20000)
        cv, cw = _compress_scalar(v, np.ones(len(v)), k)
        assert len(cv) <= k
        qs = np.array(QS)
        est = _quantiles_flat(
            cv,
            cw,
            np.array([len(cv)]),
            np.array([float(len(v))]),
            np.array([v.min()]),
            np.array([v.max()]),
            qs,
        )[0]
        sv = np.sort(v)
        for q, e in zip(qs, est):
            rank = np.searchsorted(sv, e) / len(v)
            assert abs(rank - q) <= 3.0 / k, (dist, q, rank)


def test_huge_n_precision_guard_recurses_correctly():
    """Digests with enormous n (stride ~ n) across many rows trip the
    2^52 shared-axis guard; the recursive halves must agree with per-row
    evaluation exactly."""
    rng = np.random.default_rng(17)
    R = 200
    big_n = float(2**45)
    rows_v = [np.sort(rng.normal(0, 1, 32)) for _ in range(R)]
    rows_w = [np.full(32, big_n / 32) for _ in range(R)]
    lengths = np.full(R, 32, dtype=np.int64)
    n = np.full(R, big_n)
    vmin = np.array([v[0] - 1 for v in rows_v])
    vmax = np.array([v[-1] + 1 for v in rows_v])
    qs = np.array([0.1, 0.5, 0.9])
    allr = _quantiles_flat(
        np.concatenate(rows_v), np.concatenate(rows_w), lengths, n, vmin, vmax, qs
    )
    for i in range(R):
        one = _quantiles_flat(
            rows_v[i], rows_w[i], lengths[i : i + 1], n[i : i + 1],
            vmin[i : i + 1], vmax[i : i + 1], qs,
        )[0]
        np.testing.assert_allclose(allr[i], one, rtol=1e-12)


# ------------------------------------------------------------- Spark tier


@pytest.fixture(scope="module")
def series(spark):
    # interval=60 -> 60 pts per 1h bucket (<= k=64) for normal urls;
    # url 0 is the hot series at 8x density (480 pts per 1h bucket > k)
    return pages_to_series(
        generate_pages(spark, n_urls=12, samples_per_url=300, interval_sec=60)
    ).cache()


def test_tier_exact_when_bucket_fits_and_bounded_when_not(spark, series):
    t1m = quantile_rollup(series, "1m", k=64)
    got = (
        digest_quantiles(quantile_cascade(t1m, "1h", k=64), QS)
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    exact = (
        digest_quantiles(quantile_rollup(series, "1h", k=10**6), QS)
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    assert got.index.equals(exact.index)
    qcols = [c for c in got.columns if c.startswith("p")]
    small = got["n"] <= 64
    assert small.sum() > 0 and (~small).sum() > 0  # both regimes exercised
    pd.testing.assert_frame_equal(
        got.loc[small, qcols], exact.loc[small, qcols], atol=1e-9, rtol=0
    )
    # hot buckets: rank-error bound vs the raw points of that bucket
    raw = series.toPandas()
    raw["bucket_start"] = (raw["t"] // 3600 * 3600).astype("int64")
    for (key, b), row in got.loc[~small].iterrows():
        pts = np.sort(
            raw.loc[
                (raw["series_key"] == key) & (raw["bucket_start"] == b), "value"
            ].to_numpy()
        )
        for q, col in zip(QS, qcols):
            rank = np.searchsorted(pts, row[col]) / len(pts)
            # one compression at 1m + one at the cascade -> 2 levels
            assert abs(rank - q) <= 6.0 / 64, (key, b, q, rank)


def test_digests_deterministic_across_partitionings(spark, series):
    def digests(df):
        pdf = quantile_rollup(df, "1m", k=16).toPandas()
        pdf = pdf.sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
        return pdf

    a = digests(series.repartition(3))
    b = digests(series.repartition(11, "series_key"))
    assert len(a) == len(b)
    for col in ("series_key", "bucket_start", "n", "vmin", "vmax"):
        assert (a[col] == b[col]).all()
    for x, y in zip(a["qmeans"], b["qmeans"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(a["qweights"], b["qweights"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cascade_bit_equal_while_buckets_fit(spark, series):
    """Children are unit-weight samples; while the merged coarse bucket
    still fits in k the digest stays the raw sorted sample, so cascading
    1m->1h equals the direct 1h rollup bit for bit (hot series excluded:
    480 > k)."""
    normal = series.where("series_key not like '%p00000'")
    via = quantile_cascade(quantile_rollup(normal, "1m", k=64), "1h", k=64).toPandas()
    direct = quantile_rollup(normal, "1h", k=64).toPandas()
    via = via.sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    direct = direct.sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    assert len(via) == len(direct) > 0
    for col in ("series_key", "bucket_start", "n", "vmin", "vmax"):
        assert (via[col] == direct[col]).all()
    for x, y in zip(via["qmeans"], direct["qmeans"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_series_quantiles_from_stored_tier(spark, series):
    """Whole-series percentiles re-merge STORED digests (no raw re-scan)
    and land within the cascaded rank-error bound of the raw data."""
    t1m = quantile_rollup(series, "1m", k=64)
    got = series_quantiles(t1m, [0.5, 0.95], k=64).toPandas().set_index("series_key")
    raw = series.toPandas()
    for key, grp in raw.groupby("series_key"):
        pts = np.sort(grp["value"].to_numpy())
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            rank = np.searchsorted(pts, got.loc[key, col]) / len(pts)
            assert abs(rank - q) <= 6.0 / 64, (key, q, rank)


def test_null_values_excluded_like_sql(spark):
    import pyspark.sql.functions as F

    df = spark.range(100).select(
        F.lit("k").alias("series_key"),
        (F.col("id") * 1.0).alias("t"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id").cast("double")).alias(
            "value"
        ),
    )
    out = digest_quantiles(quantile_rollup(df, "1d", k=128), [0.5]).toPandas()
    vals = np.array([float(i) for i in range(100) if i % 5 != 0])
    assert out.loc[0, "n"] == len(vals)
    np.testing.assert_allclose(out.loc[0, "p50"], np.quantile(vals, 0.5), atol=1e-12)


def test_rollup_is_one_shuffle(spark, series):
    plan = (
        quantile_rollup(series, "1m")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_bad_qs_rejected(spark, series):
    t = quantile_rollup(series.limit(10), "1m")
    with pytest.raises(ValueError):
        digest_quantiles(t, [1.5])
    with pytest.raises(ValueError):
        digest_quantiles(t, [])
