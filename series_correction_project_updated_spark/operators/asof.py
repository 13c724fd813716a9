"""As-of join — match each left row to the nearest right row per key
(the kdb ``aj`` / TimescaleDB lateral / pandas ``merge_asof`` semantics;
DuckDB's native ``ASOF JOIN`` is the independent oracle for the backward
direction in queries.q_asof_join, an ANSI lateral-``min`` for forward in
queries.q_asof_forward).

Spark has no native as-of join; the distributed-friendly shape is the
UNION + running-last/first trick rather than any per-key loop:

1. tag right rows carrying their payload, left rows with a null payload,
2. ONE window over (key) ordered by (t, side[, tiebreaker]) — the side
   column places right rows before or after t-equal left rows depending on
   ``allow_exact_matches``,
3. ``last(payload, ignorenulls=True)`` over unbounded-preceding rows
   (direction="backward") or ``first(...)`` over unbounded-following rows
   (direction="forward") gives every left row its match,
4. keep the left rows; optionally null out matches farther than
   ``tolerance`` seconds. ``direction="nearest"`` computes both fills in
   the same stage and keeps the closer (ties → backward, like pandas).

Cost: one hash shuffle on the key + one in-partition sort (two sorts for
"nearest", which needs both orderings) — the same clustering every other
per-series op uses; no join explosion, no range join, no per-key state.
Skewed keys behave exactly like any other window over the key clustering.

Determinism under duplicate right timestamps (r3 ADVICE): when the right
side can hold multiple rows at the same (key, t), pass ``tiebreaker`` (a
right column name); the row with the GREATEST tiebreaker value wins, in
every direction. Without a tiebreaker the right side is assumed unique
per (key, t) — the match is otherwise partition-order-dependent (pandas
merge_asof's "last row wins" has no distributed analog: DataFrames have
no row order).
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
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join with the pandas ``merge_asof`` surface.

    ``direction``: "backward" (latest right with ``r.t <= l.t``),
    "forward" (earliest right with ``r.t >= l.t``), or "nearest"
    (smaller ``|l.t - r.t|``; equal distance → backward, like pandas).
    ``allow_exact_matches=False`` makes the comparisons strict.
    ``payload_cols``: right columns to carry (default: all except
    key/time). ``tolerance``: max allowed ``|l.t - r.t|`` in seconds;
    farther matches become null (payload AND matched time), like
    merge_asof. The matched right timestamp is returned as
    ``{time_col}{suffix}``. ``tiebreaker``: right column deciding ties
    among equal-timestamp right rows (greatest wins; see module doc).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key_col, time_col)]
    carry = list(payload_cols)
    if tiebreaker is not None and tiebreaker not in carry:
        carry.append(tiebreaker)

    matched_t = f"{time_col}{suffix}"
    left_extra = [c for c in left.columns if c not in (key_col, time_col)]
    # side tags: sorting right rows BEFORE t-equal left rows makes an
    # unbounded-PRECEDING fill include them (inclusive backward) and a
    # currentRow-FOLLOWING fill exclude them (exclusive forward) — and
    # vice versa. One tag column serves backward, one forward.
    b_side, f_side = (0, 1) if allow_exact_matches else (1, 0)
    # The matched right row travels as ONE struct, filled atomically by a
    # single last/first(ignorenulls): per-COLUMN fills would conflate a
    # genuinely-NULL payload value with the left rows' placeholder nulls
    # and stitch columns from DIFFERENT right rows (r4 self-review #1 —
    # merge_asof carries the whole matched row or nothing).
    import pyspark.sql.types as T

    row_type = T.StructType(
        [T.StructField("t", T.DoubleType())]
        + [T.StructField(c, right.schema[c].dataType) for c in carry]
    )
    l_tag = left.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias("_is_left"),
        F.lit(1 - b_side).alias("_bside"),
        F.lit(1 - f_side).alias("_fside"),
        *[F.col(c) for c in left_extra],
        F.lit(None).cast(row_type).alias("_r_row"),
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias("_is_left"),
        F.lit(b_side).alias("_bside"),
        F.lit(f_side).alias("_fside"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        F.struct(
            F.col(time_col).cast("double").alias("t"),
            *[F.col(c).alias(c) for c in carry],
        ).alias("_r_row"),
    )
    unioned = l_tag.unionByName(r_tag)

    # tiebreaker ordering: backward keeps the LAST right row in window
    # order (so ascending puts the greatest-tiebreaker last); forward
    # keeps the FIRST (so descending puts the greatest first).
    def _order(side_col: str, desc_tb: bool):
        cols = [F.col(time_col).asc(), F.col(side_col).asc()]
        if tiebreaker is not None:
            tb = F.col("_r_row").getField(tiebreaker)
            cols.append(tb.desc_nulls_last() if desc_tb else tb.asc_nulls_first())
        return cols

    fills = []
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(key_col)
            .orderBy(*_order("_bside", desc_tb=False))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fills.append(F.last("_r_row", ignorenulls=True).over(wb).alias("_mb"))
    if direction in ("forward", "nearest"):
        wf = (
            Window.partitionBy(key_col)
            .orderBy(*_order("_fside", desc_tb=True))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fills.append(F.first("_r_row", ignorenulls=True).over(wf).alias("_mf"))

    filled = unioned.select("*", *fills).where(F.col("_is_left") == 1)
    mb_t = F.col("_mb").getField("t") if direction != "forward" else None
    mf_t = F.col("_mf").getField("t") if direction != "backward" else None

    def _ok(mt):
        cond = mt.isNotNull()
        if tolerance is not None:
            cond = cond & (F.abs(F.col(time_col) - mt) <= F.lit(float(tolerance)))
        return cond

    if direction == "backward":
        pick_t = F.when(_ok(mb_t), mb_t)
        picks = {c: F.when(_ok(mb_t), F.col("_mb").getField(c)) for c in payload_cols}
    elif direction == "forward":
        pick_t = F.when(_ok(mf_t), mf_t)
        picks = {c: F.when(_ok(mf_t), F.col("_mf").getField(c)) for c in payload_cols}
    else:  # nearest: closer side wins; equal distance or missing fwd → backward
        b_ok, f_ok = _ok(mb_t), _ok(mf_t)
        b_dist = F.abs(F.col(time_col) - mb_t)
        f_dist = F.abs(F.col(time_col) - mf_t)
        use_b = b_ok & (~f_ok | (b_dist <= f_dist))
        use_f = f_ok & ~use_b

        def _near(col_b, col_f):
            return F.when(use_b, col_b).when(use_f, col_f)

        pick_t = _near(mb_t, mf_t)
        picks = {
            c: _near(F.col("_mb").getField(c), F.col("_mf").getField(c))
            for c in payload_cols
        }

    return filled.select(
        F.col(key_col),
        F.col(time_col),
        *[F.col(c) for c in left_extra],
        *[picks[c].otherwise(F.lit(None)).alias(f"{c}{suffix}") for c in payload_cols],
        pick_t.otherwise(F.lit(None)).alias(matched_t),
    )
