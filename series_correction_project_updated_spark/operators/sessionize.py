"""Gap-based sessionization of event streams.

The classic web-analytics operator the events table implies: a user's
events belong to one session until a silence longer than ``gap_sec``
splits them. Two shapes, one semantics:

- ``session_stats`` — the SCALE path: Spark's native
  ``F.session_window(ts, gap)`` aggregate. One shuffle on the user key,
  session merging happens inside the aggregation operator (no per-event
  window sort materialized), and the same expression works unchanged in
  Structured Streaming with a watermark (session windows close when the
  watermark passes gap after the last event).
- ``sessionize`` — the ROW-LEVEL path, when every event needs its session
  id (feature extraction, per-event joins): lag + running-sum-of-breaks
  window, deterministic under duplicate timestamps via an explicit
  tiebreaker column. Costs an in-partition sort; same single shuffle.

The two agree by construction — ``tests/test_sessionize.py`` proves
session counts, boundaries and sizes identical on skewed synthetic data,
and checks the row-level ids against an independent DuckDB window query
(oracle-grade, outside the full 50-entry driver registry).

No reference counterpart (the reference has no event/session concept);
this extends the events-table analytics the engine already ships
(rollup tiers, as-of, M4) with the standard session primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreaker_col: str | None = "event_id",
    session_col: str = "session_id",
) -> DataFrame:
    """Label every event with its session ordinal (1-based per key).

    A session break is a gap STRICTLY greater than ``gap_sec`` between
    consecutive events of the same key — an event at exactly
    ``last + gap`` still merges, which is the native ``session_window``'s
    measured behavior (its windows merge on overlap-or-touch), so the two
    shapes label identical sessions even at exact boundaries (test-pinned).
    ``tiebreaker_col`` makes the ordering (and so the labels)
    deterministic under duplicate timestamps; pass None only if
    (key, ts) is known unique.
    """
    order = [ts_col] + ([tiebreaker_col] if tiebreaker_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # NTZ timestamps can't cast straight to double; via ltz both timestamp
    # flavors reach epoch seconds, and only DIFFERENCES feed the gap test,
    # so the tz interpretation cancels either way
    t = F.col(ts_col).cast("timestamp_ltz").cast("double")
    prev = F.lag(t).over(w)
    is_break = F.when(prev.isNull() | ((t - prev) > gap_sec), 1).otherwise(0)
    return events.withColumn(
        session_col,
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    gap_sec: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session summary via the native session-window aggregate.

    Returns one row per (key, session): start/end of the session's
    EVENTS (not the padded window — ``session_window.end`` includes the
    trailing gap, so the true last-event time is aggregated explicitly),
    event count, duration, and the value sum when ``value_col`` is given.

    Boundary semantics: session windows merge on overlap-or-TOUCH, so a
    gap of exactly ``gap_sec`` still MERGES — ``sessionize`` uses the
    matching strict ``>`` break, and the tests pin equality on data with
    exact-boundary gaps planted.
    """
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col(ts_col).cast("timestamp_ltz").cast("double"))
            - F.min(F.col(ts_col).cast("timestamp_ltz").cast("double"))
        ).alias("duration_sec"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("vsum"))
    return (
        events.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_sec} seconds").alias("w"),
        )
        .agg(*aggs)
        .drop("w")
    )


def transition_matrix(
    events: DataFrame,
    gap_sec: float | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreaker_col: str | None = "event_id",
) -> DataFrame:
    """Event-type bigram counts and next-step probabilities.

    ``gap_sec`` given → transitions are counted WITHIN sessions only
    (the lag partitions by (key, session_id) from ``sessionize``, so a
    session break never produces a phantom transition); ``None`` →
    per-key across the whole history. Output: (prev_type, next_type,
    cnt, prob) with prob normalized per prev_type — the empirical Markov
    matrix of the event stream.

    Same single wide shuffle as ``sessionize`` (the pairs aggregation
    re-shuffles only bigram rows, a vocabulary-sized table).
    """
    order = [ts_col] + ([tiebreaker_col] if tiebreaker_col else [])
    if gap_sec is not None:
        labeled = sessionize(events, gap_sec, key_col, ts_col, tiebreaker_col)
        w = Window.partitionBy(key_col, "session_id").orderBy(*order)
    else:
        labeled = events
        w = Window.partitionBy(key_col).orderBy(*order)
    pairs = labeled.select(
        F.lag(type_col).over(w).alias("prev_type"), F.col(type_col).alias("next_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy("prev_type")
    return counts.withColumn("prob", F.col("cnt") / F.sum("cnt").over(total))
