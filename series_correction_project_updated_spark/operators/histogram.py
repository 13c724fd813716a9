"""Fixed-bin histogram tiers — the integer-exact mergeable
distribution aggregate (Prometheus classic-histogram semantics).

Where the quantile-digest tier trades size for rank error, a fixed-bin
histogram is EXACT for its resolution and merges by plain element-wise
integer addition — cascade == direct **bit-equal**, no envelopes, no
error terms. Stored form per (key, bucket):

    counts: array<long> of length nbins+2 — [underflow] + nbins
            equal-width bins over [lo, hi) + [overflow]
    n:      exact total (== sum of counts, invariant-pinned)

Execution: the rollup is ONE map-side-combining hash aggregate — each
bin is a ``sum(when(bin == i, 1))`` counter, so the shuffle carries
nbins+2 longs per (key, bucket), never rows (``nbins ≤ 512`` guarded:
the counters live in the aggregation buffer). The cascade folds stored
arrays with ``aggregate``+``zip_with`` — pure JVM, tier rows only.

``histogram_quantile`` interpolates linearly within the located bin
(Prometheus ``histogram_quantile`` rule), giving any-window percentile
serving bounded by one bin width; underflow/overflow hits clamp to the
edge (their true spread is unknowable, also the Prometheus rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import TIER_SECONDS


def slot_expr(v, lo: float, hi: float, nbins: int):
    """Bin-slot assignment as a JVM column expression — slot 0 =
    underflow, 1..nbins = equal-width bins over [lo, hi), nbins+1 =
    overflow. Shared by the batch rollup and the streaming tier's
    pre-projection so both paths bin by the IDENTICAL expression."""
    width = (hi - lo) / nbins
    return (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(nbins + 1))
        .otherwise((F.floor((v - lo) / width) + 1).cast("int"))
    )


def histogram_rollup(
    points: DataFrame,
    tier: str = "1m",
    lo: float = 0.0,
    hi: float = 1.0,
    nbins: int = 32,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, bucket) fixed-bin histogram of ``value_col``."""
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if not 1 <= nbins <= 512:
        raise ValueError(f"nbins must be in [1, 512], got {nbins}")
    sec = TIER_SECONDS[tier]
    t = F.col(time_col).cast("timestamp_ltz").cast("double")
    bucket = (F.floor(t / sec) * sec).cast("long")
    v = F.col(value_col).cast("double")
    slot = slot_expr(v, lo, hi, nbins)
    pts = points.where(v.isNotNull()).select(
        F.col(key_col), bucket.alias("bucket_start"), slot.alias("_slot")
    )
    counters = [
        F.sum(F.when(F.col("_slot") == i, 1).otherwise(0)).alias(f"_c{i}")
        for i in range(nbins + 2)
    ]
    agg = pts.groupBy(key_col, "bucket_start").agg(*counters)
    return agg.select(
        key_col,
        "bucket_start",
        F.array(*[F.col(f"_c{i}") for i in range(nbins + 2)]).alias("counts"),
        sum(
            (F.col(f"_c{i}") for i in range(1, nbins + 2)), F.col("_c0")
        ).alias("n"),
    )


def histogram_cascade(
    fine: DataFrame,
    to_tier: str,
    key_col: str = "series_key",
) -> DataFrame:
    """Element-wise integer merge into a coarser tier — bit-equal to the
    direct rollup (pinned)."""
    sec = TIER_SECONDS[to_tier]
    coarse = (F.floor(F.col("bucket_start") / sec) * sec).cast("long")
    nslots = F.size(F.col("counts"))
    grouped = (
        fine.select(F.col(key_col), coarse.alias("bucket_start"), "counts", "n")
        .groupBy(key_col, "bucket_start")
        .agg(
            F.collect_list("counts").alias("_cs"),
            F.sum("n").alias("n"),
            F.first(nslots).alias("_k"),
        )
    )
    zero = F.array_repeat(F.lit(0).cast("long"), F.col("_k").cast("int"))
    merged = F.aggregate(
        F.col("_cs"), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )
    return grouped.select(key_col, "bucket_start", merged.alias("counts"), "n")


def histogram_quantile(
    tier_df: DataFrame,
    q: float,
    lo: float,
    hi: float,
    strategy: str = "arrow",
) -> DataFrame:
    """Prometheus-rule quantile from stored histograms: locate the bin
    holding rank ``q·n`` via a running sum, interpolate linearly inside
    it; under/overflow hits clamp to the range edge. Adds column
    ``q<percent>`` — tier rows only, no raw re-scan.

    Two physical shapes, bit-equal (pinned — both evaluate the identical
    IEEE expression sequence per row):

    - ``"arrow"`` (default): one ``mapInPandas`` pass — ``np.cumsum``
      along the slot axis + an argmax locate per Arrow batch. The
      counts-array transfer is integer columnar; measured 3.3s vs the
      JVM fold's 18.8s on a 1.17M-row 64-bin tier in the same window
      (the fold's 66-step struct accumulator is interpreted, allocating
      per step·row — and its cost swings 4× with host memory pressure
      that register-bound probes can't see, while the vectorized pass
      stays flat).
    - ``"fold"``: the all-JVM single-pass higher-order ``F.aggregate``
      locate (no Python node) — kept as the cross-check shape and for
      plans that must stay Python-free.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0,1], got {q}")
    if strategy not in ("arrow", "fold"):
        raise ValueError(f"unknown strategy {strategy!r}")
    qcol = f"q{int(round(q * 100)):02d}"

    if strategy == "arrow":
        out_schema = T.StructType(
            list(tier_df.schema.fields) + [T.StructField(qcol, T.DoubleType())]
        )
        qf, lof, hif = float(q), float(lo), float(hi)

        def _run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                cnts = np.stack(pdf["counts"].to_numpy()).astype(np.int64)
                nn = pdf["n"].to_numpy(dtype=np.int64)
                S = cnts.shape[1]
                nbins = S - 2
                width = (hif - lof) / float(nbins)
                rank = qf * nn.astype(np.float64)
                cum = np.cumsum(cnts, axis=1).astype(np.float64)
                # first slot whose running sum reaches the rank (0-based
                # here; the fold's slot is this + 1)
                slot = (cum >= rank[:, None]).argmax(axis=1)
                prev = np.where(
                    slot > 0,
                    np.take_along_axis(cum, np.maximum(slot - 1, 0)[:, None], 1)[:, 0],
                    0.0,
                )
                in_bin = np.take_along_axis(cnts, slot[:, None], 1)[:, 0].astype(
                    np.float64
                )
                with np.errstate(invalid="ignore", divide="ignore"):
                    frac = (rank - prev) / in_bin
                bin_lo = lof + (slot + 1 - 2.0) * width
                interp = bin_lo + frac * width
                est = np.minimum(np.maximum(interp, lof), hif)
                est = np.where(slot == 0, lof, est)  # underflow clamp
                est = np.where(slot == S - 1, hif, est)  # overflow clamp
                out = pdf.copy()
                # Float64 (masked) not float64: n==0 must surface as SQL
                # NULL, and Arrow keeps bare NaN as a value
                vals = pd.array(est, dtype="Float64")
                vals[nn == 0] = pd.NA
                out[qcol] = vals
                yield out

        return tier_df.mapInPandas(_run, schema=out_schema)

    counts = F.col("counts")
    nbins = F.size(counts) - 2
    width = (F.lit(hi) - F.lit(lo)) / nbins.cast("double")
    rank = F.lit(q) * F.col("n").cast("double")
    # Locate the bin holding the rank in ONE O(nslots) fold carrying
    # (running cum, found slot, cum-before-slot) — no cumulative ARRAY is
    # ever built, and the fold is materialized as its own column so every
    # downstream use is a cheap struct-field reference. (v1 recomputed an
    # O(nslots²) slice-sum per use: 190s; v2 built the cums array with
    # per-element concat: 17s; this shape: ~4s over a 1.16M-row tier.)
    indexed = F.transform(counts, lambda c, i: F.struct(c.alias("c"), i.alias("i")))
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(0).cast("int").alias("slot"),
        F.lit(0).cast("long").alias("prev"),
    )

    def _step(a, x):
        cum2 = a["cum"] + x["c"]
        hit = (a["slot"] == 0) & (cum2.cast("double") >= rank)
        return F.struct(
            cum2.alias("cum"),
            F.when(a["slot"] > 0, a["slot"])
            .when(hit, (x["i"] + 1).cast("int"))
            .otherwise(F.lit(0).cast("int"))
            .alias("slot"),
            F.when(a["slot"] > 0, a["prev"])
            .when(hit, a["cum"])
            .otherwise(cum2)
            .alias("prev"),
        )

    tier_df = tier_df.withColumn("_loc", F.aggregate(indexed, acc0, _step))
    slot = F.col("_loc")["slot"]  # 1-based over nbins+2 slots
    prev_cum = F.col("_loc")["prev"]
    in_bin = F.element_at(counts, slot)
    frac = F.try_divide(rank - prev_cum.cast("double"), in_bin.cast("double"))
    bin_lo = F.lit(lo) + (slot.cast("double") - 2.0) * width
    interp = bin_lo + frac * width
    est = (
        F.when(F.col("n") == 0, F.lit(None).cast("double"))
        .when(slot == 1, F.lit(lo))  # underflow: clamp
        .when(slot == nbins + 2, F.lit(hi))  # overflow: clamp
        .otherwise(F.least(F.greatest(interp, F.lit(lo)), F.lit(hi)))
    )
    return tier_df.withColumn(f"q{int(round(q * 100)):02d}", est).drop("_loc")
