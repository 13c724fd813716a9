"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key (the kdb ``aj`` / TimescaleDB lateral /
pandas ``merge_asof`` semantics; DuckDB's native ``ASOF JOIN`` serves as
the independent oracle in queries.q_asof_join).

Spark has no native as-of join; the distributed-friendly shape is the
UNION + running-last trick rather than any per-key loop:

1. tag right rows side=0 carrying their payload, left rows side=1 with a
   null payload,
2. ONE window over (key) ordered by (t, side) — right rows sort before
   left rows at equal timestamps, making the match INCLUSIVE of t-equal
   rights (merge_asof/ASOF JOIN semantics),
3. ``last(payload, ignorenulls=True)`` over unbounded-preceding rows gives
   every left row the latest right payload ≤ its t,
4. keep the left rows; optionally null out matches older than
   ``tolerance`` seconds.

Cost: one hash shuffle on the key + one in-partition sort — the same
clustering every other per-series op uses; no join explosion, no range
join, no per-key state. Skewed keys behave exactly like any other window
over the key clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "series_key",
    time_col: str = "t",
    payload_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right.t <= left.t`` for the same key (inclusive), else nulls.

    ``payload_cols``: right columns to carry (default: all except key/time).
    ``tolerance``: max allowed ``left.t - right.t`` in seconds; older
    matches become null (payload AND matched time), like merge_asof.
    The matched right timestamp is returned as ``{time_col}{suffix}``.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key_col, time_col)]

    matched_t = f"{time_col}{suffix}"
    l_tag = left.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (key_col, time_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
        F.lit(None).cast("double").alias("_r_t"),
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (key_col, time_col)],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        F.col(time_col).cast("double").alias("_r_t"),
    )
    unioned = l_tag.unionByName(r_tag)

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in payload_cols],
        F.last("_r_t", ignorenulls=True).over(w).alias("_m_t"),
    )
    out = filled.where(F.col("_side") == 1)
    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col(time_col) - F.col("_m_t")) <= F.lit(float(tolerance))
    )
    return out.select(
        F.col(key_col),
        F.col(time_col),
        *[F.col(c) for c in left.columns if c not in (key_col, time_col)],
        *[
            F.when(F.col("_m_t").isNotNull() & in_tol, F.col(f"_m_{c}"))
            .otherwise(F.lit(None))
            .alias(f"{c}{suffix}")
            for c in payload_cols
        ],
        F.when(F.col("_m_t").isNotNull() & in_tol, F.col("_m_t")).otherwise(F.lit(None)).alias(matched_t),
    )
