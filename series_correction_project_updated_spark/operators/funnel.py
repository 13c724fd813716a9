"""Ordered-funnel analysis over the events table.

"Of the users who did step 1, how many went on to do step 2, then 3,
in that order (optionally within a time budget of step 1)?" — the
standard product-analytics question over exactly the events shape this
engine ships (user_id, ts, event_type).

Spark-first shape — ONE hash shuffle and zero Python, zero joins:

    groupBy(user) → sort_array(collect_list(struct(ts, tiebreak, type)))
                  → F.aggregate fold (JVM higher-order function)

The fold's state is the array of first-reach timestamps per step
(prefix-filled: step j+1 can only be stamped after step j), so each
event advances the funnel by at most one step and the whole per-user
scan is a single pass inside whole-stage-codegen'd catalyst expressions.
The naive alternative is k self-joins (one per step) — k shuffles of the
full event table and a skew hazard per join; this is one shuffle total,
the same clustering the rollup/session operators use.

Memory: per-user state during the fold is O(k); the collected event list
is bounded by events-per-user (same bound as `sessionize`'s window sort —
for bot-grade hot keys pre-filter ``events.filter(type in steps)``, which
also shrinks the shuffle to funnel-relevant rows; the tests assert the
filtered and unfiltered funnels agree).

Oracle: an independent single-node pandas implementation in the tests
replays the same semantics event by event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: list[str],
    within_sec: float | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreaker_col: str | None = "event_id",
) -> DataFrame:
    """Per key: first-reach timestamp of every funnel step, in order.

    Returns one row per key with ``step_ts`` (array, null where the
    funnel stalled) and ``steps_reached``. A step counts only if it
    happens strictly-or-equal AFTER the previous step's first reach
    (ties in ``ts`` are ordered by ``tiebreaker_col``, so an A,B pair at
    the same timestamp completes A→B iff the tiebreaker orders them so).
    ``within_sec`` bounds the whole funnel relative to step 1's reach.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    order_fields = [F.col(ts_col).cast("timestamp_ltz").cast("double").alias("t")]
    if tiebreaker_col:
        order_fields.append(F.col(tiebreaker_col).alias("tb"))
    ev = F.struct(*order_fields, F.col(type_col).alias("tp"))

    steps_arr = F.array(*[F.lit(s) for s in steps])

    def advance(acc, e):
        # prefix-filled state → the next open step index is the non-null count
        j = F.size(F.filter(acc, lambda x: x.isNotNull()))  # 0-based next step
        in_budget = (
            F.lit(True)
            if within_sec is None
            else (j == 0) | ((e["t"] - F.element_at(acc, 1)) <= F.lit(float(within_sec)))
        )
        hit = (j < k) & (e["tp"] == F.element_at(steps_arr, j + 1)) & in_budget
        return F.transform(
            acc, lambda x, i: F.when(hit & (i == j), e["t"]).otherwise(x)
        )

    init = F.array_repeat(F.lit(None).cast("double"), k)
    folded = (
        events.groupBy(key_col)
        .agg(F.sort_array(F.collect_list(ev)).alias("evs"))
        .select(
            key_col,
            F.aggregate(F.col("evs"), init, advance).alias("step_ts"),
        )
    )
    return folded.withColumn(
        "steps_reached", F.size(F.filter(F.col("step_ts"), lambda x: x.isNotNull()))
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within_sec: float | None = None,
    **kw,
) -> DataFrame:
    """The funnel report: users reaching AT LEAST each step, with
    step-over-step conversion. One extra tiny aggregation over
    ``funnel_reach`` (k rows out)."""
    reach = funnel_reach(events, steps, within_sec, **kw)
    per_depth = (
        reach.groupBy("steps_reached").count().collect()
    )  # ≤ k+1 rows — bounded driver work
    by_depth = {r[0]: r[1] for r in per_depth}
    k = len(steps)
    cum = 0
    rows = []
    for depth in range(k, 0, -1):
        cum += by_depth.get(depth, 0)
        rows.append((depth, steps[depth - 1], cum))
    spark = events.sparkSession
    out = spark.createDataFrame(
        sorted(rows), "step int, step_name string, users long"
    )
    prev = F.lag("users").over(Window.orderBy("step"))
    # try_divide: a funnel nobody enters has users=0 at every depth and
    # 0/0 raises DIVIDE_BY_ZERO under ANSI mode — report null conversion
    return out.withColumn(
        "conversion",
        F.when(prev.isNull(), F.lit(1.0)).otherwise(F.try_divide(F.col("users"), prev)),
    )
