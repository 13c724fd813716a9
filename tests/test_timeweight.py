"""Time-weighted average tier: pandas reference cross-check, exact
additive cascade, constant-series law, multi-bucket splits, locf vs
linear, max_gap drop, JVM-only plan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.timeweight import (
    time_weighted_cascade,
    time_weighted_rollup,
)


def _reference(pdf, sec, method):
    """Independent per-segment split-and-integrate in plain python."""
    out = {}
    for key, grp in pdf.groupby("series_key"):
        grp = grp.sort_values("t")
        ts = grp["t"].to_numpy()
        vs = grp["value"].to_numpy()
        for i in range(len(ts) - 1):
            t0, t1, v0, v1 = ts[i], ts[i + 1], vs[i], vs[i + 1]
            if t1 <= t0:
                continue
            e = np.floor(t0 / sec) * sec
            while e < t1:
                a, b = max(t0, e), min(t1, e + sec)
                if b > a:
                    if method == "locf":
                        area = (b - a) * v0
                    else:
                        va = v0 + (v1 - v0) * (a - t0) / (t1 - t0)
                        vb = v0 + (v1 - v0) * (b - t0) / (t1 - t0)
                        area = (b - a) * (va + vb) / 2.0
                    k = (key, int(e))
                    acc = out.setdefault(k, [0.0, 0.0])
                    acc[0] += area
                    acc[1] += b - a
                e += sec
    return out


@pytest.fixture(scope="module")
def irregular(spark):
    rng = np.random.default_rng(19)
    frames = []
    for k in ("a", "b", "c"):
        # irregular spacing incl. segments spanning several 1m buckets
        gaps = rng.choice([3.0, 10.0, 45.0, 200.0], size=300, p=[0.5, 0.3, 0.15, 0.05])
        t = 1.7e9 + np.cumsum(gaps)
        frames.append(
            pd.DataFrame({"series_key": k, "t": t, "value": rng.normal(10, 3, 300)})
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True)).cache()


@pytest.mark.parametrize("method", ["linear", "locf"])
def test_matches_reference(spark, irregular, method):
    pdf = irregular.toPandas()
    got = time_weighted_rollup(irregular, "1m", method=method).toPandas()
    ref = _reference(pdf, 60, method)
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        integral, covered = ref[(r["series_key"], r["bucket_start"])]
        assert r["integral"] == pytest.approx(integral, rel=1e-9)
        assert r["covered_sec"] == pytest.approx(covered, rel=1e-9)
        assert r["twa"] == pytest.approx(integral / covered, rel=1e-9)


def test_cascade_equals_direct(spark, irregular):
    via = (
        time_weighted_cascade(time_weighted_rollup(irregular, "1m"), "1h")
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    direct = (
        time_weighted_rollup(irregular, "1h")
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(via) == len(direct) > 0
    assert (via["series_key"] == direct["series_key"]).all()
    assert (via["bucket_start"] == direct["bucket_start"]).all()
    np.testing.assert_allclose(via["integral"], direct["integral"], rtol=1e-12)
    np.testing.assert_allclose(via["covered_sec"], direct["covered_sec"], rtol=1e-12)


def test_constant_series_twa_is_constant(spark):
    t = 1.7e9 + np.cumsum(np.array([1.0, 7.0, 300.0, 2.0, 500.0, 13.0] * 20))
    pdf = pd.DataFrame({"series_key": "k", "t": t, "value": 4.25})
    out = time_weighted_rollup(spark.createDataFrame(pdf), "1h").toPandas()
    np.testing.assert_allclose(out["twa"], 4.25, rtol=0, atol=1e-12)


def test_multi_bucket_segment_hand_case(spark):
    # one segment spanning 3 one-minute buckets: [50, 170], v 0 -> 12
    pdf = pd.DataFrame(
        {"series_key": "k", "t": [50.0, 170.0], "value": [0.0, 12.0]}
    )
    out = (
        time_weighted_rollup(spark.createDataFrame(pdf), "1m")
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    assert out["bucket_start"].tolist() == [0, 60, 120]
    assert out["covered_sec"].tolist() == [10.0, 60.0, 50.0]
    # slope 0.1/s: v(50)=0 v(60)=1 v(120)=7 v(170)=12
    np.testing.assert_allclose(
        out["integral"], [10 * 0.5, 60 * 4.0, 50 * 9.5], rtol=1e-12
    )


def test_locf_vs_linear_semantics(spark):
    pdf = pd.DataFrame({"series_key": "k", "t": [0.0, 10.0], "value": [2.0, 6.0]})
    df = spark.createDataFrame(pdf)
    lin = time_weighted_rollup(df, "1m").toPandas()
    locf = time_weighted_rollup(df, "1m", method="locf").toPandas()
    assert lin.loc[0, "twa"] == pytest.approx(4.0)  # trapezoid
    assert locf.loc[0, "twa"] == pytest.approx(2.0)  # step holds v0


def test_max_gap_drops_dark_segments(spark):
    pdf = pd.DataFrame(
        {"series_key": "k", "t": [0.0, 10.0, 100000.0, 100010.0], "value": [1.0] * 4}
    )
    out = time_weighted_rollup(
        spark.createDataFrame(pdf), "1m", max_gap_sec=3600.0
    ).toPandas()
    assert out["covered_sec"].sum() == 20.0  # the dark span contributes nothing


def test_jvm_only_plan(spark, irregular):
    plan = (
        time_weighted_rollup(irregular, "1m")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE shuffle total: the aggregate's ClusteredDistribution on
    # (key, bucket) is satisfied by the window's hashpartitioning(key),
    # so the groupBy adds no exchange of its own
    assert plan.count("Exchange") == 1
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    assert "Generate" in plan  # the edge-split explode
