"""Histogram tier: bins vs numpy, cascade bit-equal direct, quantile
within one bin width, DuckDB crosscheck."""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.histogram import (
    histogram_cascade,
    histogram_quantile,
    histogram_rollup,
)

LO, HI, NBINS = 10.0, 90.0, 16


def _pdf(seed=17, n=4000, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    frames = []
    for k in keys:
        t = 1.7e9 + np.sort(rng.uniform(0, 4 * 3600, n))
        v = rng.normal(50, 20, n)  # tails exercise under/overflow slots
        frames.append(pd.DataFrame({"series_key": k, "t": t, "value": v}))
    return pd.concat(frames, ignore_index=True)


def _np_counts(v):
    under = int((v < LO).sum())
    over = int((v >= HI).sum())
    bins, _ = np.histogram(
        v[(v >= LO) & (v < HI)], bins=NBINS, range=(LO, HI)
    )
    return [under] + bins.tolist() + [over]


def test_bins_match_numpy_and_sum_invariant(spark):
    pdf = _pdf()
    got = (
        histogram_rollup(spark.createDataFrame(pdf), "1h", LO, HI, NBINS)
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    assert len(got) >= 8
    for (k, b), row in got.iterrows():
        g = pdf[(pdf["series_key"] == k)]
        v = g[(g["t"] >= b) & (g["t"] < b + 3600)]["value"].to_numpy()
        assert list(row["counts"]) == _np_counts(v), (k, b)
        assert row["n"] == len(v) == sum(row["counts"])


def test_cascade_bit_equal_direct(spark):
    df = spark.createDataFrame(_pdf(seed=19))
    fine = histogram_rollup(df, "1m", LO, HI, NBINS)
    via = (
        histogram_cascade(fine, "1h")
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    direct = (
        histogram_rollup(df, "1h", LO, HI, NBINS)
        .toPandas()
        .set_index(["series_key", "bucket_start"])
        .sort_index()
    )
    assert via.index.equals(direct.index)
    np.testing.assert_array_equal(via["n"], direct["n"])
    assert [list(c) for c in via["counts"]] == [list(c) for c in direct["counts"]]


def test_quantile_within_bin_width(spark):
    pdf = _pdf(seed=23, keys=("a",))
    tier = histogram_rollup(spark.createDataFrame(pdf), "1h", LO, HI, NBINS)
    width = (HI - LO) / NBINS
    for q in (0.5, 0.9, 0.99):
        got = (
            histogram_quantile(tier, q, LO, HI)
            .toPandas()
            .set_index("bucket_start")
            .sort_index()
        )
        col = f"q{int(round(q * 100)):02d}"
        for b, row in got.iterrows():
            v = pdf[(pdf["t"] >= b) & (pdf["t"] < b + 3600)]["value"].to_numpy()
            exact = np.quantile(v, q)
            if LO <= exact < HI:
                assert abs(row[col] - exact) <= width, (q, b)
            else:
                assert LO <= row[col] <= HI  # clamped into range


def test_duckdb_bin_crosscheck(spark):
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(29)
    t = 1.7e9 + np.sort(rng.choice(2 * 3600, 1000, replace=False)).astype("float64")
    pdf = pd.DataFrame(
        {"series_key": "a", "t": t, "value": rng.normal(50, 20, 1000)}
    )
    got = (
        histogram_rollup(spark.createDataFrame(pdf), "1h", LO, HI, NBINS)
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pts", pdf)
    want = con.execute(
        f"""
        SELECT CAST(floor(t/3600)*3600 AS BIGINT) AS bucket_start,
               CASE WHEN value < {LO} THEN 0
                    WHEN value >= {HI} THEN {NBINS + 1}
                    ELSE CAST(floor((value - {LO}) / {(HI - LO) / NBINS}) AS INT) + 1
               END AS slot,
               COUNT(*) AS c
        FROM pts GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchdf()
    for _, row in got.iterrows():
        w = want[want["bucket_start"] == row["bucket_start"]]
        dense = np.zeros(NBINS + 2, dtype=np.int64)
        dense[w["slot"].to_numpy()] = w["c"].to_numpy()
        assert list(row["counts"]) == dense.tolist()


def test_guards(spark):
    df = spark.createDataFrame(_pdf(seed=1, n=10, keys=("a",)))
    with pytest.raises(ValueError):
        histogram_rollup(df, "1m", 5.0, 5.0)
    with pytest.raises(ValueError):
        histogram_rollup(df, "1m", 0.0, 1.0, nbins=1000)
    with pytest.raises(ValueError):
        histogram_quantile(histogram_rollup(df, "1m", LO, HI, 4), 1.5, LO, HI)


def test_quantile_strategies_bit_equal(spark):
    """The Arrow locate and the JVM fold evaluate the identical IEEE
    expression sequence per row — outputs bit-equal, including the
    n==0 -> NULL rule and under/overflow clamps."""
    pdf = _pdf()
    tier = histogram_rollup(spark.createDataFrame(pdf), "1m", LO, HI, NBINS)
    a = (
        histogram_quantile(tier, 0.95, LO, HI, strategy="arrow")
        .select("series_key", "bucket_start", "q95")
        .toPandas().sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    )
    b = (
        histogram_quantile(tier, 0.95, LO, HI, strategy="fold")
        .select("series_key", "bucket_start", "q95")
        .toPandas().sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    np.testing.assert_array_equal(a["q95"].to_numpy(), b["q95"].to_numpy())

    # hand-built tier row with n=0: both shapes must yield SQL NULL
    z = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_key": ["z"],
                "bucket_start": [0],
                "counts": [[0] * (NBINS + 2)],
                "n": [0],
            }
        )
    )
    for strat in ("arrow", "fold"):
        row = histogram_quantile(z, 0.5, 0.0, 10.0, strategy=strat).collect()[0]
        assert row["q50"] is None, strat
    with pytest.raises(ValueError):
        histogram_quantile(tier, 0.5, LO, HI, strategy="nope")
