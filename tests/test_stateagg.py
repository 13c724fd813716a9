"""state_rollup / state_cascade / dominant_state: time-in-state tiers —
hand-checked splits, exact additivity, pandas replay, drift composition,
plan shape."""

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.stateagg import (
    dominant_state,
    state_cascade,
    state_rollup,
)


def test_hand_checked_splits(spark):
    # k: up [0,90) -> down [90,150) -> up [150,240); last obs at 240 open
    rows = [("k", 0.0, "up"), ("k", 90.0, "down"), ("k", 150.0, "up"), ("k", 240.0, "down")]
    df = spark.createDataFrame(rows, "series_key string, t double, state string")
    got = {
        (r["bucket_start"], r["state"]): r["duration_sec"]
        for r in state_rollup(df, "1m").collect()
    }
    assert got == {
        (0, "up"): 60.0,          # [0,60)
        (60, "up"): 30.0,         # [60,90)
        (60, "down"): 30.0,       # [90,120)
        (120, "down"): 30.0,      # [120,150)
        (120, "up"): 30.0,        # [150,180)
        (180, "up"): 60.0,        # [180,240)
    }
    # total covered time == span of closed segments
    assert sum(got.values()) == 240.0


def _random_states(seed=7, n_series=6, n=300):
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_series):
        t = np.cumsum(rng.integers(5, 400, n)).astype("float64")
        states = rng.choice(["a", "b", "c"], n)
        rows += [(f"s{k}", float(ti), si) for ti, si in zip(t, states)]
    return pd.DataFrame(rows, columns=["series_key", "t", "state"])


def test_cascade_equals_direct(spark):
    df = spark.createDataFrame(_random_states())
    t1m = state_rollup(df, "1m")
    via = state_cascade(t1m, "1h").toPandas()
    direct = state_rollup(df, "1h").toPandas()
    key = ["series_key", "bucket_start", "state"]
    via = via.sort_values(key).reset_index(drop=True)
    direct = direct.sort_values(key).reset_index(drop=True)
    assert len(via) == len(direct)
    assert (via[key] == direct[key]).all().all()
    np.testing.assert_allclose(via["duration_sec"], direct["duration_sec"], rtol=1e-12)


def test_matches_pandas_replay(spark):
    pdf = _random_states(seed=11, n_series=3, n=120)
    got = (
        state_rollup(spark.createDataFrame(pdf), "1m")
        .toPandas()
        .sort_values(["series_key", "bucket_start", "state"])
        .reset_index(drop=True)
    )
    want_rows = {}
    for k, g in pdf.groupby("series_key"):
        g = g.sort_values("t").reset_index(drop=True)
        for i in range(len(g) - 1):
            t0, t1, s = g.t[i], g.t[i + 1], g.state[i]
            b = int(t0 // 60) * 60
            while b < t1:
                dur = min(t1, b + 60) - max(t0, b)
                if dur > 0:
                    want_rows[(k, b, s)] = want_rows.get((k, b, s), 0.0) + dur
                b += 60
    assert len(got) == len(want_rows)
    for r in got.itertuples():
        assert want_rows[(r.series_key, r.bucket_start, r.state)] == pytest.approx(
            r.duration_sec, rel=1e-12
        )


def test_max_gap_drops_dark_segments(spark):
    rows = [("k", 0.0, "up"), ("k", 60.0, "up"), ("k", 100_000.0, "down"), ("k", 100_060.0, "down")]
    df = spark.createDataFrame(rows, "series_key string, t double, state string")
    full = state_rollup(df, "1h").agg(F.sum("duration_sec")).collect()[0][0]
    gated = (
        state_rollup(df, "1h", max_gap_sec=3600.0)
        .agg(F.sum("duration_sec"))
        .collect()[0][0]
    )
    assert full == pytest.approx(100_060.0)
    assert gated == pytest.approx(120.0)  # only the two 60s segments


def test_dominant_state_and_tie(spark):
    rows = [
        ("k", 0, "up", 40.0),
        ("k", 0, "down", 20.0),
        ("t", 0, "b", 30.0),
        ("t", 0, "a", 30.0),  # tie → greater state string wins ("b")
    ]
    tier = spark.createDataFrame(
        rows, "series_key string, bucket_start long, state string, duration_sec double"
    )
    got = {r["series_key"]: r for r in dominant_state(tier).collect()}
    assert got["k"]["state"] == "up" and got["k"]["share"] == pytest.approx(2 / 3)
    assert got["t"]["state"] == "b" and got["t"]["share"] == pytest.approx(0.5)


def test_composes_with_drift_classes(spark):
    """Drift change classes ARE states: time-in-churn per day."""
    from series_correction_project_updated_spark.operators.drift import content_drift

    base = "some stable page text body here"
    rows = []
    for d in range(4):
        txt = base if d < 2 else f"rewritten version {d} entirely different now"
        rows.append(("u", float(1_700_000_000 + d * 43200), txt))
    pages = spark.createDataFrame(rows, "url string, warc_ts double, text string")
    drift = content_drift(pages, time_col="warc_ts")
    tier = state_rollup(
        drift, "1d", key_col="url", time_col="t", state_col="change"
    )
    per_state = {
        r["state"]: r["dur"]
        for r in tier.groupBy("state").agg(F.sum("duration_sec").alias("dur")).collect()
    }
    # 3 closed 12h segments: first->unchanged->rewrite->(open rewrite)
    assert per_state == {
        "first": pytest.approx(43200.0),
        "unchanged": pytest.approx(43200.0),
        "rewrite": pytest.approx(43200.0),
    }


def test_plan_shape(spark):
    df = spark.createDataFrame(_random_states(n_series=2, n=50))
    plan = state_rollup(df, "1m")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "CartesianProduct" not in plan
    assert len(re.findall(r"^\s*[+\-:* ]*Exchange\b", plan, re.M)) == 1


def test_duplicate_timestamp_deterministic(spark):
    """Two states at the same t: the zero-width first (by state order)
    drops, the last owns the segment — identical at any partitioning."""
    rows = [("k", 100.0, "up"), ("k", 100.0, "down"), ("k", 160.0, "up")]
    df = spark.createDataFrame(rows, "series_key string, t double, state string")
    a = sorted(map(tuple, state_rollup(df, "1m").collect()))
    b = sorted(map(tuple, state_rollup(df.repartition(7), "1m").collect()))
    assert a == b
    # 'up' > 'down' in string order → 'up' owns [100, 160)
    assert a == [("k", 60, "up", 20.0), ("k", 120, "up", 40.0)]
