"""Custom STATEFUL streaming operator #5: live counter tier.

``applyInPandasWithState`` analog of ``operators.counters.counter_rollup``:
per series the state is ONE OPEN BUCKET (plus the last accepted point),
because accepted arrivals are strictly time-increasing (out-of-order
rows are skipped, the shared policy), so the bucket index is
nondecreasing and a bucket CLOSES exactly when the first point of a
later bucket arrives. Closed buckets are emitted with the full batch
column set (n, first/last envelope, inc_within, resets,
boundary_increase/reset, bucket_increase, rate).

Exactness: the within-bucket walk adds contributions in time order both
here and in the batch JVM fold — the carry continues the same left
fold, so on a fully delivered in-order stream every CLOSED bucket is
**bit-equal** to the batch ``counter_rollup`` row (float data included;
test-pinned across micro-batch splits). Late re-deliveries reconcile
through the batch ``refresh_tier`` path, as with the rollup stream.

Per batch the arithmetic is vectorized: one diff/where pass over all
accepted points plus ``np.add.reduceat`` per bucket segment — Python
touches segments (≤ buckets per batch), never rows.

``state_ttl_ms > 0`` additionally FLUSHES the open bucket when a series
goes idle (emit-on-timeout), trading the exact close-on-next-bucket
boundary for bounded emission delay.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import TIER_SECONDS

COUNTER_BUCKET = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("bucket_start", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("first_t", T.DoubleType(), False),
        T.StructField("first_v", T.DoubleType(), False),
        T.StructField("last_t", T.DoubleType(), False),
        T.StructField("last_v", T.DoubleType(), False),
        T.StructField("inc_within", T.DoubleType(), False),
        T.StructField("resets", T.LongType(), False),
        T.StructField("boundary_increase", T.DoubleType(), False),
        T.StructField("boundary_reset", T.LongType(), False),
        T.StructField("bucket_increase", T.DoubleType(), False),
        T.StructField("rate", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_t", T.DoubleType()),
        T.StructField("bucket_start", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("first_t", T.DoubleType()),
        T.StructField("first_v", T.DoubleType()),
        T.StructField("last_v", T.DoubleType()),
        T.StructField("inc_within", T.DoubleType()),
        T.StructField("resets", T.LongType()),
        T.StructField("boundary_increase", T.DoubleType()),
        T.StructField("boundary_reset", T.LongType()),
    ]
)

_COLS = [f.name for f in COUNTER_BUCKET.fields]


def counter_stream(
    points_stream: DataFrame,
    tier: str = "1m",
    state_ttl_ms: int = 0,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Keyed stateful counter tier over a stream of (key, t, value)."""
    sec = TIER_SECONDS[tier]

    def _close(key, st) -> tuple:
        (_lt, b, n, ft, fv, lv, inc, res, binc, bres) = st
        total = inc + binc
        return (key, b, n, ft, fv, _lt, lv, inc, res, binc, bres, total, total / sec)

    def _update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                row = _close(key[0], state.get)
                state.remove()
                yield pd.DataFrame([row], columns=_COLS)
            else:
                state.remove()
            return
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.dropna(subset=[value_col]).sort_values(time_col)
        ts = pdf[time_col].to_numpy(dtype="float64")
        xs = pdf[value_col].to_numpy(dtype="float64")
        open_st = list(state.get) if state.exists else None
        if open_st is not None:
            keep = ts > open_st[0]
            ts, xs = ts[keep], xs[keep]
        if len(ts) == 0:
            if open_st is not None and state_ttl_ms > 0:
                state.setTimeoutDuration(state_ttl_ms)
            return

        buckets = (np.floor(ts / sec) * sec).astype(np.int64)
        prev = np.empty(len(xs))
        prev[0] = open_st[5] if open_st is not None else np.nan
        prev[1:] = xs[:-1]
        diff = xs - prev
        with np.errstate(invalid="ignore"):
            contrib = np.where(diff >= 0, diff, xs)
            reset = diff < 0
        if open_st is None:
            contrib[0] = 0.0  # series' very first point: no predecessor
            reset[0] = False

        # segment starts: bucket transitions (plus index 0)
        starts = np.concatenate(([0], np.flatnonzero(buckets[1:] != buckets[:-1]) + 1))
        seg_res = np.add.reduceat(reset.astype(np.int64), starts)
        ends = np.concatenate((starts[1:], [len(xs)])) - 1

        # bit-equality with the batch JVM fold requires the SAME addition
        # order: cumsum is a strict left fold (ufunc.accumulate, never
        # pairwise), so seed it with the carry — np.add.reduceat is
        # pairwise and reassociates (caught: 3% of straddling buckets off
        # in the last ulp)
        def _fold(seed: float, c: np.ndarray) -> float:
            if len(c) == 0:
                return seed
            return float(np.cumsum(np.concatenate(([seed], c)))[-1])

        out = []
        for j, s in enumerate(starts):
            e = ends[j]
            b = int(buckets[s])
            if open_st is not None and b == open_st[1]:
                # continue the open bucket: the segment's first diff is a
                # WITHIN contribution (same bucket as the carry point)
                open_st[2] += int(e - s + 1)
                open_st[5] = float(xs[e])
                open_st[6] = _fold(open_st[6], contrib[s : e + 1])
                open_st[7] += int(seg_res[j])
                open_st[0] = float(ts[e])
                continue
            if open_st is not None:
                out.append(_close(key[0], open_st))
            # new bucket: its first point's contribution is the BOUNDARY
            open_st = [
                float(ts[e]),
                b,
                int(e - s + 1),
                float(ts[s]),
                float(xs[s]),
                float(xs[e]),
                _fold(0.0, contrib[s + 1 : e + 1]),
                int(seg_res[j] - reset[s]),
                float(contrib[s]),
                int(reset[s]),
            ]
        state.update(tuple(open_st))
        if state_ttl_ms > 0:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return points_stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=COUNTER_BUCKET,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
