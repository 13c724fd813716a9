"""Interval (range) joins — match points to enclosing intervals, and
intervals to overlapping intervals, per key.

Spark has no native range join: expressing ``p.t BETWEEN i.lo AND i.hi``
directly gives Catalyst only a non-equi condition, which plans as
BroadcastNestedLoopJoin (small side) or a cartesian product — O(P·I) row
comparisons, hopeless at 100 TB. The distributed-friendly shape is
**bucket decomposition** (the same trick DuckDB's iejoin literature and
TimescaleDB chunk exclusion use, recast as a Spark equi-join):

1. quantize time into fixed buckets of ``bucket_seconds``;
2. explode every interval into the one row PER BUCKET it overlaps
   (``sequence(floor(lo/b), floor(hi/b))``) — intervals travel once per
   covered bucket, points exactly once (a point has one bucket);
3. hash equi-join on ``(key, bucket)`` — a plain shuffle/broadcast join
   Catalyst knows how to plan, partial-aggregable downstream;
4. filter the exact containment predicate inside the matched bucket.

Each qualifying (point, interval) pair is emitted exactly once with no
``distinct()``: the point's single bucket is covered by the interval, so
exactly one exploded interval row meets it. For interval×interval overlap
the same holds via the **max-lo bucket rule**: a pair is emitted only in
the bucket containing ``greatest(lo_l, lo_r)``, which both sides cover
iff the intervals overlap — one emission, no dedup exchange.

Cost: one shuffle of points (never duplicated) + one shuffle of intervals
inflated by their mean span/bucket ratio. ``bucket_seconds`` trades
interval fan-out against bucket selectivity; ``suggest_bucket_seconds``
picks the median interval span, bounding mean fan-out near 2×. Skewed
keys shard across buckets naturally (the join key is (key, bucket), not
key alone), so a hot series with a long history does NOT land on one
reducer — time itself is the salt (docs/SCALE.md).

Long-interval guard: one interval spanning the whole table would explode
into span/bucket rows. ``validate=True`` runs a bounded one-scalar agg of
the max fan-out and raises before planning the join if it exceeds
``max_buckets_per_interval``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CLOSED = {
    "both": (Column.__ge__, Column.__le__),
    "left": (Column.__ge__, Column.__lt__),
    "right": (Column.__gt__, Column.__le__),
    "neither": (Column.__gt__, Column.__lt__),
}


def _bucket(col, bucket_seconds: float):
    return F.floor(col / F.lit(float(bucket_seconds))).cast("long")


def _explode_buckets(
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_seconds: float,
    out_col: str,
) -> DataFrame:
    # lo > hi is an empty interval, but sequence(b_lo, b_hi) would COUNT
    # DOWN and emit spurious bucket rows for it — drop such rows up front
    # (the containment predicate could never keep them anyway).
    return intervals.where(F.col(lo_col) <= F.col(hi_col)).withColumn(
        out_col,
        F.explode(
            F.sequence(
                _bucket(F.col(lo_col), bucket_seconds),
                _bucket(F.col(hi_col), bucket_seconds),
            )
        ),
    )


def suggest_bucket_seconds(
    intervals: DataFrame, lo_col: str = "t_start", hi_col: str = "t_end"
) -> float:
    """Median interval span — the bucket width at which mean interval
    fan-out stays near 2 rows/interval. One bounded scalar agg."""
    row = intervals.select(
        F.expr(f"percentile_approx({hi_col} - {lo_col}, 0.5)").alias("m")
    ).first()
    span = float(row["m"] or 0.0)
    return max(span, 1.0)


def _validate_fanout(
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_seconds: float,
    cap: int,
) -> None:
    worst = intervals.select(
        F.max(
            _bucket(F.col(hi_col), bucket_seconds)
            - _bucket(F.col(lo_col), bucket_seconds)
            + F.lit(1)
        ).alias("w")
    ).first()["w"]
    if worst is not None and worst > cap:
        raise ValueError(
            f"an interval spans {worst} buckets of {bucket_seconds}s "
            f"(cap {cap}); raise bucket_seconds or split the interval"
        )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str = "series_key",
    time_col: str = "t",
    lo_col: str = "t_start",
    hi_col: str = "t_end",
    bucket_seconds: float = 3600.0,
    closed: str = "both",
    validate: bool = False,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Inner-join each point to every interval of the same key that
    contains it (``closed``: "both" lo<=t<=hi, "left" lo<=t<hi,
    "right" lo<t<=hi, "neither" strict). Returns all point columns plus
    the intervals' non-key columns; pairs appear exactly once.

    The plan is equi-join on (key, floor(t/bucket)) + an in-join filter —
    no nested loop, no distinct. Interval columns must not collide with
    point columns (rename before calling).
    """
    if closed not in _CLOSED:
        raise ValueError(f"closed must be one of {sorted(_CLOSED)}, got {closed!r}")
    collide = (set(intervals.columns) - {key_col}) & set(points.columns)
    if collide:
        raise ValueError(f"interval columns collide with point columns: {sorted(collide)}")
    if validate:
        _validate_fanout(intervals, lo_col, hi_col, bucket_seconds, max_buckets_per_interval)
    ge_lo, le_hi = _CLOSED[closed]

    iv = _explode_buckets(intervals, lo_col, hi_col, bucket_seconds, "__ibkt")
    pt = points.withColumn("__pbkt", _bucket(F.col(time_col), bucket_seconds))
    cond = (
        (pt[key_col] == iv[key_col])
        & (pt["__pbkt"] == iv["__ibkt"])
        & ge_lo(pt[time_col], iv[lo_col])
        & le_hi(pt[time_col], iv[hi_col])
    )
    joined = pt.join(iv, cond, "inner")
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c != key_col
    ]
    return joined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "series_key",
    left_cols: tuple[str, str] = ("t_start", "t_end"),
    right_cols: tuple[str, str] = ("r_start", "r_end"),
    bucket_seconds: float = 3600.0,
    closed: str = "both",
    validate: bool = False,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Inner-join overlapping interval pairs per key, each pair exactly
    once (the max-lo bucket rule — see module doc). ``closed="both"``
    counts touching endpoints (lo_r == hi_l) as overlap; "neither"
    requires a positive-length intersection.

    Column names must be disjoint apart from ``key_col``.
    """
    if closed not in ("both", "neither"):
        raise ValueError(f"closed must be 'both' or 'neither', got {closed!r}")
    llo, lhi = left_cols
    rlo, rhi = right_cols
    collide = (set(right.columns) - {key_col}) & set(left.columns)
    if collide:
        raise ValueError(f"right columns collide with left columns: {sorted(collide)}")
    if validate:
        _validate_fanout(left, llo, lhi, bucket_seconds, max_buckets_per_interval)
        _validate_fanout(right, rlo, rhi, bucket_seconds, max_buckets_per_interval)

    lb = _explode_buckets(left, llo, lhi, bucket_seconds, "__lbkt")
    rb = _explode_buckets(right, rlo, rhi, bucket_seconds, "__rbkt")
    le = Column.__le__ if closed == "both" else Column.__lt__
    max_lo_bucket = _bucket(F.greatest(lb[llo], rb[rlo]), bucket_seconds)
    cond = (
        (lb[key_col] == rb[key_col])
        & (lb["__lbkt"] == rb["__rbkt"])
        # emit only in the bucket holding greatest(lo_l, lo_r): both sides
        # cover that bucket iff the pair overlaps -> exactly-once emission
        & (lb["__lbkt"] == max_lo_bucket)
        & le(lb[llo], rb[rhi])
        & le(rb[rlo], lb[lhi])
    )
    joined = lb.join(rb, cond, "inner")
    keep = [lb[c] for c in left.columns] + [
        rb[c] for c in right.columns if c != key_col
    ]
    return joined.select(*keep)
