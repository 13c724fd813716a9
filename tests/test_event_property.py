"""Property tests: funnel and sessionize vs single-node replay oracles
on adversarial random event streams (duplicate timestamps, boundary gaps,
single-user bursts, empty-type mixes).

Spark round-trips are slow per example, so each property batches MANY
random users into ONE DataFrame per example and keeps example counts
small; the randomness concentrates on the nasty parts (ts collisions,
exact-gap spacing).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.funnel import funnel_reach
from series_correction_project_updated_spark.operators.sessionize import sessionize

GAP = 100.0
STEPS = ["a", "b", "c"]

# event times drawn from a SMALL grid including exact-gap multiples so
# collisions and boundary gaps occur constantly
_ts = st.integers(min_value=0, max_value=12).map(lambda k: k * 50.0)
_type = st.sampled_from(["a", "b", "c", "x"])
_user_events = st.lists(st.tuples(_ts, _type), min_size=1, max_size=12)
_corpus = st.lists(_user_events, min_size=1, max_size=8)


def _mk(spark, corpus):
    rows = []
    eid = 0
    for uid, evs in enumerate(corpus):
        for t, tp in evs:
            rows.append((uid, float(t), eid, tp))
            eid += 1
    return spark.createDataFrame(
        rows, "user_id long, t double, event_id long, event_type string"
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_id", "event_type")


def _sessions_oracle(corpus):
    """Per-EVENT-ID session label (event ids assigned exactly as _mk does)."""
    out = {}
    eid_base = 0
    for uid, evs in enumerate(corpus):
        ordered = sorted((t, i) for i, (t, _) in enumerate(evs))
        sid, prev = 0, None
        for t, i in ordered:
            if prev is None or (t - prev) > GAP:
                sid += 1
            out[eid_base + i] = sid
            prev = t
        eid_base += len(evs)
    return out


def _funnel_oracle(corpus, within=None):
    out = {}
    for uid, evs in enumerate(corpus):
        ordered = sorted((t, i, tp) for i, (t, tp) in enumerate(evs))
        state = [None] * len(STEPS)
        for t, _, tp in ordered:
            j = sum(s is not None for s in state)
            if j >= len(STEPS):
                break
            if within is not None and j > 0 and (t - state[0]) > within:
                continue
            if tp == STEPS[j]:
                state[j] = t
        out[uid] = state
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None)
@given(_corpus)
def test_sessionize_matches_oracle(spark, corpus):
    df = _mk(spark, corpus)
    got = {r.event_id: r.session_id for r in sessionize(df, gap_sec=GAP).collect()}
    assert got == _sessions_oracle(corpus)


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None)
@given(_corpus, st.one_of(st.none(), st.just(150.0)))
def test_funnel_matches_oracle(spark, corpus, within):
    df = _mk(spark, corpus)
    got = {r.user_id: list(r.step_ts) for r in funnel_reach(df, STEPS, within_sec=within).collect()}
    assert got == _funnel_oracle(corpus, within)
