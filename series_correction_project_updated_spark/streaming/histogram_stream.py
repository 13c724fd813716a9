"""Custom STATEFUL streaming operator #9: live fixed-bin histogram tier.

``applyInPandasWithState`` analog of ``operators.histogram
.histogram_rollup``: per series the state is ONE OPEN BUCKET's counts
array (nbins+2 longs). Counting commutes, so — like the top-k stream
and unlike the integral/counter streams — out-of-order rows INSIDE the
open bucket are accepted; only the bucket frontier is monotone: a
bucket CLOSES when a row for a LATER bucket arrives, and rows for
already-closed buckets are skipped (late data reconciles through the
batch ``refresh_tier``/cascade path, the shared policy).

Exactness: closed buckets are **bit-equal** to ``histogram_rollup``
rows by construction — bucket id AND bin slot are computed by the SAME
JVM expressions in the stream's pre-projection (``slot_expr`` is
imported from the batch operator, so there is exactly one binning
expression in the codebase), and within a bucket the merge is integer
addition, which is order-free. Test-pinned across micro-batch splits,
including boundary values lo/hi and under/overflow hits.

The per-batch update is vectorized: one ``np.bincount`` per touched
bucket segment over the batch's slot column — Python touches (bucket)
segments, never rows. Closed rows feed ``histogram_cascade`` /
``histogram_quantile`` unchanged.

``state_ttl_ms > 0`` additionally FLUSHES the open bucket when a
series goes idle (emit-on-timeout), trading the exact
close-on-next-bucket boundary for bounded emission delay.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.histogram import slot_expr
from ..schema import TIER_SECONDS

HISTOGRAM_BUCKET = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("bucket_start", T.LongType(), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
        T.StructField("n", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket_start", T.LongType()),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)

_COLS = [f.name for f in HISTOGRAM_BUCKET.fields]


def histogram_stream(
    points_stream: DataFrame,
    tier: str = "1m",
    lo: float = 0.0,
    hi: float = 1.0,
    nbins: int = 32,
    state_ttl_ms: int = 0,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Keyed stateful histogram tier over a stream of (key, t, value);
    emits (key, bucket_start, counts, n) rows as buckets close."""
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if not 1 <= nbins <= 512:
        raise ValueError(f"nbins must be in [1, 512], got {nbins}")
    sec = TIER_SECONDS[tier]
    nslots = nbins + 2

    def _close(key: str, bucket: int, counts: np.ndarray) -> tuple:
        return (key, bucket, counts.tolist(), int(counts.sum()))

    def _update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                b, cs = state.get
                state.remove()
                yield pd.DataFrame(
                    [_close(key[0], b, np.asarray(cs, dtype=np.int64))],
                    columns=_COLS,
                )
            else:
                state.remove()
            return
        pdf = pd.concat(list(batches), ignore_index=True).dropna(subset=["_slot"])
        if state.exists:
            b_open, cs = state.get
            counts = np.asarray(cs, dtype=np.int64)
        else:
            b_open, counts = None, np.zeros(nslots, dtype=np.int64)
        if b_open is not None:
            pdf = pdf[pdf["_bucket"] >= b_open]
        if len(pdf) == 0:
            if b_open is not None and state_ttl_ms > 0:
                state.setTimeoutDuration(state_ttl_ms)
            return

        buckets = pdf["_bucket"].to_numpy(dtype=np.int64)
        slots = pdf["_slot"].to_numpy(dtype=np.int64)
        order = np.argsort(buckets, kind="stable")
        buckets, slots = buckets[order], slots[order]
        starts = np.concatenate(([0], np.flatnonzero(buckets[1:] != buckets[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(buckets)]))
        out = []
        for s, e in zip(starts, ends):
            b = int(buckets[s])
            if b_open is not None and b != b_open:
                out.append(_close(key[0], b_open, counts))
                counts = np.zeros(nslots, dtype=np.int64)
            b_open = b
            counts += np.bincount(slots[s:e], minlength=nslots)
        state.update((b_open, counts.tolist()))
        if state_ttl_ms > 0:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    t = F.col(time_col).cast("timestamp_ltz").cast("double")
    v = F.col(value_col).cast("double")
    pre = points_stream.where(v.isNotNull()).select(
        F.col(key_col),
        (F.floor(t / sec) * sec).cast("long").alias("_bucket"),
        slot_expr(v, lo, hi, nbins).alias("_slot"),
    )
    return pre.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=HISTOGRAM_BUCKET,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
