"""Counter aggregates: increase / rate with reset handling, as a
mergeable tier (PromQL ``increase``/``rate``, TimescaleDB
``counter_agg`` semantics).

Monotonic counters (bytes served, requests, crawl fetch totals) reset to
zero on restart, so ``max - min`` per bucket undercounts and plain sums
double-count. The standard rule: walk points in time order; a
non-negative delta counts as-is, a negative delta means the counter
restarted and the new value counts from zero:

    contribution(prev -> cur) = cur - prev   if cur >= prev
                                cur          otherwise (reset)

``counter_rollup`` stores per (key, bucket): within-bucket increase,
reset count, and the exact (first_t, first_v, last_t, last_v) envelope.
The envelope is what makes the tier MERGEABLE: the increase across a
bucket boundary is ``contribution(prev.last_v -> next.first_v)``, so

    counter_cascade(counter_rollup(raw, "1m"), "1h")
        == counter_rollup(raw, "1h")        (EXACTLY — telescoping)

holds bit-for-bit, with no raw re-scan (test-pinned; the quantile/HLL
tiers only get estimate-level laws — counters cascade exactly).
``bucket_increase`` additionally charges each boundary contribution to
the LATER bucket, so summing it over any contiguous bucket range equals
the whole-range increase (test-pinned).

Execution shape (``strategy="window"``, the default): ONE hash shuffle
clustering (key, bucket), the within-bucket walk read off a codegen'd
``lag`` after the window sort, then a plain HashAggregate of primitive
sums — per-group state O(1) no matter how many points land in a bucket
(the ``"fold"`` alternative keeps ``sort_array(collect_list)`` + a JVM
higher-order fold: per-group state O(points/bucket) and ObjectHash-
Aggregate's sort-based fallback past 64k groups — retained as the
cross-check shape; both are bit-equal even on float data because the
post-exchange aggregate consumes each group in window-sorted order,
i.e. the same left fold — test-pinned). No Python anywhere; the
boundary pass is a ``lag`` window over the TIER (one row per bucket),
not raw data. DuckDB-oracle-able via a lag window (tests cross-check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import TIER_SECONDS


def _bucket(time_col: str, sec: int):
    t = F.col(time_col).cast("timestamp_ltz").cast("double")
    return (F.floor(t / sec) * sec).cast("long")


def _fold_increase(pts_col: str):
    """JVM fold over a sorted array<struct<t,v>>: (increase, resets)."""
    pts = F.col(pts_col)
    rest = F.slice(pts, 2, F.greatest(F.size(pts) - 1, F.lit(0)))
    init = F.struct(
        pts[0]["v"].alias("prev"),
        F.lit(0.0).alias("inc"),
        F.lit(0).cast("long").alias("resets"),
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x["v"].alias("prev"),
        (
            acc["inc"]
            + F.when(x["v"] >= acc["prev"], x["v"] - acc["prev"]).otherwise(x["v"])
        ).alias("inc"),
        (acc["resets"] + F.when(x["v"] < acc["prev"], 1).otherwise(0)).alias("resets"),
    )
    return F.aggregate(rest, init, step)


def _with_boundaries(tier: DataFrame, key_col: str, bucket_sec: int) -> DataFrame:
    """Add boundary_increase (prev bucket's last -> this bucket's first,
    reset rule; 0 for a series' first bucket) and the summable
    bucket_increase, plus per-second rate columns."""
    w = Window.partitionBy(key_col).orderBy("bucket_start")
    prev_last = F.lag("last_v").over(w)
    boundary = F.when(prev_last.isNull(), F.lit(0.0)).otherwise(
        F.when(F.col("first_v") >= prev_last, F.col("first_v") - prev_last).otherwise(
            F.col("first_v")
        )
    )
    return (
        tier.withColumn("boundary_increase", boundary)
        .withColumn(
            "boundary_reset",
            F.when(prev_last.isNotNull() & (F.col("first_v") < prev_last), 1)
            .otherwise(0)
            .cast("long"),
        )
        .withColumn("bucket_increase", F.col("inc_within") + F.col("boundary_increase"))
        .withColumn("rate", F.col("bucket_increase") / F.lit(float(bucket_sec)))
    )


def counter_rollup(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    strategy: str = "window",
) -> DataFrame:
    """Per-(key, bucket) counter aggregate over raw points. Nulls are
    excluded. Columns: n, first_t/first_v/last_t/last_v (exact envelope),
    inc_within, resets, boundary_increase, boundary_reset,
    bucket_increase, rate.

    Two physical shapes, identical output (equality test-pinned; both
    walk points in (t, v) order):

    - ``"window"`` (default): one sort per (key, bucket) partition, the
      walk read off a codegen'd ``lag``, then a plain HashAggregate of
      primitive sums + ``min/max(struct(t, v))`` for the envelope — no
      arrays, no ObjectHashAggregate, per-group state O(1) regardless
      of points per bucket, map-side partials on the agg. The groupBy
      reuses the window's (key, bucket) clustering so the pair costs
      ONE exchange total.
    - ``"fold"``: ``sort_array(collect_list(struct))`` + one JVM
      higher-order fold — per-group state O(points per bucket), and
      past the ObjectHashAggregate fallback threshold the whole
      aggregate degrades to sort-based. Kept as the cross-check shape
      (it is the form the DuckDB oracle mirrors).
    """
    if strategy not in ("window", "fold"):
        raise ValueError(f"unknown strategy {strategy!r}")
    sec = TIER_SECONDS[tier]
    v = F.col(value_col)

    if strategy == "window":
        pts = points.where(v.isNotNull()).select(
            F.col(key_col),
            _bucket(time_col, sec).alias("bucket_start"),
            F.col(time_col).cast("timestamp_ltz").cast("double").alias("_t"),
            v.cast("double").alias("_v"),
        )
        w = Window.partitionBy(key_col, "bucket_start").orderBy("_t", "_v")
        prev_v = F.lag("_v").over(w)
        contrib = F.when(F.col("_v") >= prev_v, F.col("_v") - prev_v).otherwise(
            F.col("_v")
        )
        stepped = pts.select(
            key_col,
            "bucket_start",
            "_t",
            "_v",
            F.when(prev_v.isNull(), F.lit(0.0)).otherwise(contrib).alias("_inc"),
            F.when(prev_v.isNotNull() & (F.col("_v") < prev_v), 1)
            .otherwise(0)
            .cast("long")
            .alias("_reset"),
        )
        # primitive min_by/max_by keep the whole aggregate in HashAggregate
        # (a struct min/max buffer would force SortAggregate — the same
        # finding as rollup.py's min_by switch). Envelope ties under
        # duplicate (key, t): min_by is tie-arbitrary where the fold shape
        # tiebreaks on v — feed unique (key, t) (the tier-store contract)
        # for shape-identical envelopes.
        g = stepped.groupBy(key_col, "bucket_start").agg(
            F.count("*").alias("n"),
            F.min("_t").alias("first_t"),
            F.min_by("_v", "_t").alias("first_v"),
            F.max("_t").alias("last_t"),
            F.max_by("_v", "_t").alias("last_v"),
            F.sum("_inc").alias("inc_within"),
            F.sum("_reset").alias("resets"),
        )
        return _with_boundaries(g, key_col, sec)

    g = (
        points.where(v.isNotNull())
        .groupBy(F.col(key_col), _bucket(time_col, sec).alias("bucket_start"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(time_col).cast("timestamp_ltz").cast("double").alias("t"),
                        v.cast("double").alias("v"),
                    )
                )
            ).alias("_pts"),
            F.count(v).alias("n"),
        )
    )
    fold = _fold_increase("_pts")
    g = g.select(
        key_col,
        "bucket_start",
        "n",
        F.col("_pts")[0]["t"].alias("first_t"),
        F.col("_pts")[0]["v"].alias("first_v"),
        F.element_at("_pts", -1)["t"].alias("last_t"),
        F.element_at("_pts", -1)["v"].alias("last_v"),
        fold["inc"].alias("inc_within"),
        fold["resets"].alias("resets"),
    )
    return _with_boundaries(g, key_col, sec)


def counter_cascade(
    fine: DataFrame,
    to_tier: str,
    key_col: str = "series_key",
) -> DataFrame:
    """Merge a finer counter tier into a coarser one — EXACTLY equal to
    the direct rollup (telescoping: the coarse within-bucket walk is the
    child walks plus the child-boundary contributions, under the same
    reset rule), touching only tier rows."""
    sec = TIER_SECONDS[to_tier]
    g = (
        fine.groupBy(F.col(key_col), _bucket("bucket_start", sec).alias("bucket_start"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "bucket_start",
                        "first_t",
                        "first_v",
                        "last_t",
                        "last_v",
                        "inc_within",
                        "resets",
                    )
                )
            ).alias("_ch"),
            F.sum("n").alias("n"),
        )
    )
    ch = F.col("_ch")
    rest = F.slice(ch, 2, F.greatest(F.size(ch) - 1, F.lit(0)))
    init = F.struct(
        ch[0]["last_v"].alias("prev"),
        ch[0]["inc_within"].alias("inc"),
        ch[0]["resets"].alias("resets"),
    )
    step = lambda acc, c: F.struct(  # noqa: E731
        c["last_v"].alias("prev"),
        (
            acc["inc"]
            + c["inc_within"]
            + F.when(
                c["first_v"] >= acc["prev"], c["first_v"] - acc["prev"]
            ).otherwise(c["first_v"])
        ).alias("inc"),
        (
            acc["resets"]
            + c["resets"]
            + F.when(c["first_v"] < acc["prev"], 1).otherwise(0)
        ).alias("resets"),
    )
    fold = F.aggregate(rest, init, step)
    g = g.select(
        key_col,
        "bucket_start",
        "n",
        ch[0]["first_t"].alias("first_t"),
        ch[0]["first_v"].alias("first_v"),
        F.element_at("_ch", -1)["last_t"].alias("last_t"),
        F.element_at("_ch", -1)["last_v"].alias("last_v"),
        fold["inc"].alias("inc_within"),
        fold["resets"].alias("resets"),
    )
    return _with_boundaries(g, key_col, sec)
