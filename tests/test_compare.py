"""Tests for the raw-vs-corrected QA job (operators/compare.py): the native
rolling outlier flags must EXACTLY match the Arrow kernel's detector, and
the merged comparison table must have the reference's full-outer semantics
(export_comparison_sheets.py:191-263)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.compare import (
    compare_raw_corrected,
    rolling_outlier_flags,
)
from series_correction_project_updated_spark.oracle import correction as oracle


def _series(rng, n, outliers_at=()):
    v = np.cumsum(rng.normal(0, 0.5, n)) + 10.0
    for i in outliers_at:
        v[i] += 40.0
    return v


def test_native_flags_match_oracle_detector(spark):
    rng = np.random.default_rng(7)
    frames = []
    for key in range(6):
        n = 80 + key * 17
        v = _series(rng, n, outliers_at=(10, 40, n - 7))
        if key == 2:
            v[20] = np.nan  # missing value: its 5 windows must not flag
        frames.append(
            pd.DataFrame({"series_key": str(key), "t": np.arange(n, dtype="float64"), "value": v})
        )
    pdf = pd.concat(frames, ignore_index=True)
    sdf = spark.createDataFrame(pdf)

    got = (
        rolling_outlier_flags(sdf, window_size=5, threshold=3.0)
        .orderBy("series_key", "t")
        .toPandas()
    )
    for key, grp in pdf.groupby("series_key"):
        want_pos = set(oracle.detect_outliers(grp["value"].to_numpy(), 5, 3.0))
        got_grp = got[got.series_key == key].reset_index(drop=True)
        got_pos = set(np.where(got_grp["is_outlier"].to_numpy())[0].tolist())
        assert got_pos == want_pos, f"series {key}: {got_pos} != {want_pos}"


def test_native_flags_zero_mad_guard(spark):
    # constant series: MAD = 0 everywhere; only the genuine spike may flag
    v = [5.0] * 30
    v[15] = 9.0
    pdf = pd.DataFrame({"series_key": "c", "t": np.arange(30, dtype="float64"), "value": v})
    got = (
        rolling_outlier_flags(spark.createDataFrame(pdf))
        .orderBy("t")
        .toPandas()["is_outlier"]
        .to_numpy()
    )
    want = np.zeros(30, dtype=bool)
    want[list(oracle.detect_outliers(np.array(v), 5, 3.0))] = True
    assert (got == want).all()


def test_compare_full_outer_semantics(spark):
    raw = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_key": "s",
                "t": [0.0, 1.0, 2.0, 3.0, 4.0],
                "value": [1.0, 1.1, 9.9, 1.2, 1.3],
            }
        )
    )
    corrected = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_key": "s",
                # t=2 corrected, t=2.5 gap-inserted, t=4 dropped
                "t": [0.0, 1.0, 2.0, 2.5, 3.0],
                "value": [1.0, 1.1, 1.15, 1.17, 1.2],
            }
        )
    )
    out = compare_raw_corrected(raw, corrected).orderBy("t").toPandas()
    assert len(out) == 6  # union of both time sets
    r25 = out[out.t == 2.5].iloc[0]
    assert pd.isna(r25["value_raw"]) and r25["value_corrected"] == 1.17 and r25["changed"]
    r4 = out[out.t == 4.0].iloc[0]
    assert pd.isna(r4["value_corrected"]) and r4["value_raw"] == 1.3 and r4["changed"]
    r2 = out[out.t == 2.0].iloc[0]
    assert r2["changed"] and abs(r2["diff"] - (1.15 - 9.9)) < 1e-12
    r0 = out[out.t == 0.0].iloc[0]
    assert not r0["changed"] and r0["diff"] == 0.0
    assert not out["outlier_flag"].isna().any()


def test_positional_concat_fallback(spark):
    from series_correction_project_updated_spark.operators.compare import (
        positional_concat,
    )

    left = spark.createDataFrame(
        pd.DataFrame({"t": [0.0, 1.0, 2.0], "v": [10.0, 11.0, 12.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"ts": [5.0, 6.0, 7.0, 8.0], "w": [20.0, 21.0, 22.0, 23.0]})
    )
    out = positional_concat(left, right, "t", "ts").toPandas()
    assert list(out.columns) == ["t_raw", "v_raw", "ts_processed", "w_processed"]
    assert len(out) == 4  # unequal lengths: shorter side null-padded
    assert out.iloc[0].tolist() == [0.0, 10.0, 5.0, 20.0]
    assert pd.isna(out.iloc[3]["t_raw"]) and out.iloc[3]["w_processed"] == 23.0
