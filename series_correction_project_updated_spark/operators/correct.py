"""Distributed discontinuity correction — the grouped Arrow kernel.

The reference pipeline's per-series logic (CUSUM reset scan, rolling exact
median/MAD, positional-index step composition — reference
scripts/processor.py:540-572) is inherently sequential WITHIN a series but
embarrassingly parallel ACROSS series. So the Spark mapping is one
``groupBy(series_key).applyInPandas`` whose body is the shared single-node
oracle (``oracle/correction.py``) — Arrow-vectorized, zero per-row Python.

Scale notes (100 TB / 10^12 rows):
- Shuffle: exactly ONE hash shuffle on ``series_key``; everything downstream
  (rollups) re-uses that clustering where possible. Off a bucketed point
  store (sources/bucketstore) even that shuffle disappears —
  ``assume_clustered=True`` makes the job scan → kernel, zero exchanges.
- Skew: a hot url can dwarf others. ``correct_series_chunked`` splits long
  series into fixed TIME chunks (default 1 year, mirroring the reference's
  own year-file decomposition) processed independently, then realigns chunk
  boundaries with level shifts (scripts/apply_refined_corrections.py) via
  ``operators/level_shift.py``.
- Memory: ``correct_series`` concatenates each PARTITION into one pandas
  frame, so its memory bound is partition size — size ``num_partitions`` so
  rows_total/num_partitions fits comfortably in an executor's Python worker
  (the default 4×parallelism gives ~32 MB frames at sf0.1; scale it with
  input rows). For series too hot for any partition budget, use
  ``correct_series_chunked``, whose bound is rows-per-(series, time-chunk).
- Null vs NaN: Spark nulls become NaN inside Arrow (doubles) — the oracle is
  NaN-native, and output NaN maps back to NULL-free doubles or null as-is.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle import correction as oracle
from ..oracle.global_mad import MAD_FLOOR, Z_CONST
from ..schema import CORRECTED_POINTS


def correct_series(
    points: DataFrame,
    config: dict[str, Any] | None = None,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
    assume_clustered: bool = False,
    partitioner: str = "hash",
) -> DataFrame:
    """Run the full 3-step correction per series. Returns (series_key, t, value).

    ``points``: long-format (series_key, t:double epoch-seconds, value:double).

    Execution shape: ONE explicit hash shuffle on the series key (explicit
    ``repartition`` rather than groupBy's implicit exchange, for two scale
    reasons), then ``mapInPandas`` with an in-pandas groupby:

    1. AQE's bytes-based partition coalescing is blind to Python cost — on a
       small-bytes/heavy-compute kernel stage it coalesces to ~1 task and
       serializes the job (measured 22s → 8s at sf0.1/local[32]). A
       user-specified repartition is exempt from AQE coalescing and still
       satisfies the clustering requirement, so no second exchange happens.
    2. ``groupBy().applyInPandas`` pays per-GROUP Arrow/pandas setup — ruinous
       for many small series. ``mapInPandas`` streams each partition as one
       Arrow sequence and the kernel does a plain ``pandas.groupby`` inside
       (hash partitioning guarantees no series straddles partitions).

    Default partition count: 2× parallelism — small enough tasks to smooth
    group-size skew, large enough to amortize per-task Arrow/Python setup
    (r6: measured 64 vs 128 partitions at sf0.1/local[32]: 3.1s vs 4.8s —
    per-task fixed cost dominates shuffle-size effects at this input size;
    extreme per-series skew is ``correct_series_chunked``'s job either way).
    """
    cfg = {**oracle.DEFAULT_CONFIG, **(config or {})}
    if num_partitions is None:
        num_partitions = points.sparkSession.sparkContext.defaultParallelism * 2

    def _process_partition(batches):
        # r6 shape: one factorize + stable argsort clusters the partition by
        # key (same group order and intra-group row order as the former
        # pandas ``groupby(sort=False)``), each series runs through the
        # array-native ``process_tv`` (no per-series frame construction),
        # and output is yielded in ~256k-row batches (large Arrow batches
        # instead of one per series, memory still bounded per partition).
        # Gap-inserted rows carry NaN values; the key column is rebuilt by
        # ``np.repeat`` (the oracle mirrors the reference's all-NaN gap
        # rows, scripts/discontinuity_utils.py:137-140).
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        keys = pdf[key_col].to_numpy()
        t = pdf[time_col].to_numpy(dtype=np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        del pdf, chunks
        codes, uniques = pd.factorize(keys)  # -1 for null keys (groupby drops them)
        order = np.argsort(codes, kind="stable")
        order = order[int((codes == -1).sum()) :]
        t, v, codes = t[order], v[order], codes[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(codes) else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], len(codes)] if len(starts) else starts
        key_arr = np.asarray(uniques, dtype=object)
        buf_t, buf_v, buf_k, buf_lens, buffered = [], [], [], [], 0
        for s, e in zip(starts, ends):
            t_out, v_out, _ = oracle.process_tv(t[s:e], v[s:e], cfg)
            buf_t.append(t_out)
            buf_v.append(v_out)
            buf_k.append(key_arr[codes[s]])
            buf_lens.append(len(t_out))
            buffered += len(t_out)
            if buffered >= 262_144:
                yield pd.DataFrame(
                    {
                        "series_key": np.repeat(np.asarray(buf_k, dtype=object), buf_lens),
                        "t": np.concatenate(buf_t),
                        "value": np.concatenate(buf_v),
                    }
                )
                buf_t, buf_v, buf_k, buf_lens, buffered = [], [], [], [], 0
        if buf_lens:
            yield pd.DataFrame(
                {
                    "series_key": np.repeat(np.asarray(buf_k, dtype=object), buf_lens),
                    "t": np.concatenate(buf_t),
                    "value": np.concatenate(buf_v),
                }
            )

    # assume_clustered: the caller guarantees no series straddles input
    # partitions (a bucketed store read via sources/bucketstore — the
    # write-time shuffle already clustered by key), so the kernel's one
    # exchange disappears and the whole job is scan → kernel. The partition
    # count (and so the pandas memory bound) is then the store's bucket
    # count, fixed at write time.
    # partitioner="range": cluster with repartitionByRange(key) instead of a
    # hash exchange. Same whole-series-per-partition guarantee (equal keys
    # always land in one range partition), but partitions come out ORDERED by
    # key, so a caller that needs globally sorted output can follow the
    # kernel with a shuffle-free sortWithinPartitions(key, t) instead of a
    # global orderBy. That matters because gap-fill EXPANDS the data — the
    # range sampling here reads the small pre-expansion input, where an
    # orderBy after the kernel would sample AND shuffle the multiplied
    # output (measured 9.3s → ~4s on q_gapfill_linear at sf0.1, whose
    # 100k input rows gap-fill to 3.6M output rows).
    if assume_clustered:
        clustered = points
    elif partitioner == "range":
        clustered = points.repartitionByRange(num_partitions, key_col)
    elif partitioner == "hash":
        clustered = points.repartition(num_partitions, key_col)
    else:
        raise ValueError(f"unknown partitioner: {partitioner!r}")
    return clustered.mapInPandas(_process_partition, schema=CORRECTED_POINTS)


def correct_and_rollup(
    points: DataFrame,
    tier: str = "1m",
    config: dict[str, Any] | None = None,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Correction kernel FUSED with the finest rollup tier — the production
    fast path for the pipeline's first stage.

    Equivalent to ``rollup(correct_series(points), tier)`` but with a far
    better physical plan: each series is already a time-sorted pandas frame
    inside the kernel, so the bucket aggregation is one vectorized
    ``groupby`` there — first/last read straight off the sort order, and the
    job needs NO post-kernel shuffle and no JVM aggregation at all. The
    staged form pays a second 10^12-row shuffle and, worse, its
    ``min_by``/``max_by`` aggregates run on ObjectHashAggregate, which
    sort-falls-back and spills on high-cardinality buckets (measured 2.2×
    the stage time at 12.8M points).

    Aggregate semantics match ``operators.rollup.rollup`` exactly: cnt/min/
    max skip missing values, an all-missing bucket keeps a null vsum, and
    vfirst/vlast are the bucket's first/last value in time order whether or
    not missing (Spark's ``min_by`` does not skip nulls — ``nth``, not
    pandas ``first``). vsum may differ from the staged form in the last ulp
    (pairwise vs sequential float association); tests bound it.
    """
    from ..schema import ROLLUP, TIER_SECONDS

    sec = TIER_SECONDS[tier]
    cfg = {**oracle.DEFAULT_CONFIG, **(config or {})}
    if num_partitions is None:
        num_partitions = points.sparkSession.sparkContext.defaultParallelism * 2

    def _process_partition(batches):
        # r6: factorize + array-native process_tv (see correct_series)
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        karr = pdf[key_col].to_numpy()
        t = pdf[time_col].to_numpy(dtype=np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        del pdf, chunks
        codes, uniques = pd.factorize(karr)
        order = np.argsort(codes, kind="stable")
        order = order[int((codes == -1).sum()) :]
        t, v, codes = t[order], v[order], codes[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(codes) else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], len(codes)] if len(starts) else starts
        key_arr = np.asarray(uniques, dtype=object)
        ts_list, vs_list, keys = [], [], []
        for s, e in zip(starts, ends):
            t_out, v_out, _ = oracle.process_tv(t[s:e], v[s:e], cfg)
            ts_list.append(t_out)
            vs_list.append(v_out)
            keys.append(key_arr[codes[s]])
        yield _bucket_rollup_partition(ts_list, vs_list, keys, sec)

    return points.repartition(num_partitions, key_col).mapInPandas(
        _process_partition, schema=ROLLUP
    )


def _bucket_rollup_partition(ts_list: list, vs_list: list, keys: list, sec: int) -> pd.DataFrame:
    """Tier aggregation of a whole partition's corrected series in ONE
    vectorized pass (r4): each series frame is time-sorted by the kernel,
    so its tier buckets are CONTIGUOUS RUNS — run boundaries are the union
    of series starts and bucket changes, found with one ``diff``, and
    every aggregate is a ``reduceat`` over those boundaries. Replaces the
    per-series pandas-groupby form (kept below as ``_bucket_rollup``, the
    reference for the equality test): at the 1m tier a 20s-cadence
    partition holds ~3 points per bucket, so the pandas path paid ~130k
    tiny groups × 6 aggregation kernels plus a frame build per series —
    measured 40% of the kernel stage's Python time; this pass is ~20×
    faster on the same partition.

    Aggregate semantics are identical to ``_bucket_rollup`` (exact on
    cnt/min/max/first/last — ``fmin/fmax.reduceat`` skip NaN, positions
    read first/last including NaN; test-pinned): cnt counts non-NaN, an
    all-NaN bucket keeps a NaN vsum. vsum is a per-run ``add.reduceat``
    (plain sequential fold) where pandas groupby-sum uses Kahan
    compensation — a last-ulp difference on some buckets, the SAME
    association family as the staged JVM sum and inside the tolerance the
    fused-vs-staged test already bounds.
    """
    t = np.concatenate(ts_list) if ts_list else np.array([], dtype=np.float64)
    v = np.concatenate(vs_list) if vs_list else np.array([], dtype=np.float64)
    lens = np.fromiter((len(a) for a in ts_list), dtype=np.int64, count=len(ts_list))
    cols = ["series_key", "bucket_start", "cnt", "vsum", "vmin", "vmax", "vfirst", "vlast"]
    if len(t) == 0:
        return pd.DataFrame(
            {
                "series_key": pd.array([], dtype=object),
                "bucket_start": np.array([], dtype=np.int64),
                "cnt": np.array([], dtype=np.int64),
                "vsum": np.array([], dtype=np.float64),
                "vmin": np.array([], dtype=np.float64),
                "vmax": np.array([], dtype=np.float64),
                "vfirst": np.array([], dtype=np.float64),
                "vlast": np.array([], dtype=np.float64),
            }
        )[cols]
    series_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    bucket = (np.floor(t / sec) * sec).astype("int64")
    change = np.empty(len(t), dtype=bool)
    change[0] = True
    np.not_equal(bucket[1:], bucket[:-1], out=change[1:])
    # a TRAILING zero-length series puts len(t) in series_starts — mask it
    # before indexing (interior zero-length entries are harmless: they
    # share the next series' start, which must split anyway)
    change[series_starts[series_starts < len(t)]] = True  # same bucket across a series boundary still splits
    starts = np.flatnonzero(change)
    ends = np.concatenate((starts[1:], [len(t)]))
    ok = ~np.isnan(v)
    cnt = np.add.reduceat(ok.astype(np.int64), starts)
    vsum = np.add.reduceat(np.where(ok, v, 0.0), starts)
    vsum = np.where(cnt > 0, vsum, np.nan)
    nanv = np.where(ok, v, np.nan)
    # zero-length series own no rows; side="right" maps each run to the
    # LAST series starting at/before it, which is the one that owns it
    sidx = np.searchsorted(series_starts, starts, side="right") - 1
    return pd.DataFrame(
        {
            "series_key": np.asarray(keys, dtype=object)[sidx],
            "bucket_start": bucket[starts],
            "cnt": cnt,
            "vsum": vsum,
            "vmin": np.fmin.reduceat(nanv, starts),
            "vmax": np.fmax.reduceat(nanv, starts),
            "vfirst": v[starts],
            "vlast": v[ends - 1],
        }
    )[cols]


def _bucket_rollup(out: pd.DataFrame, key, sec: int) -> pd.DataFrame:
    """Vectorized tier aggregation of one corrected series frame (already
    time-sorted by the kernel, so vfirst/vlast read straight off the order).
    Reference (pandas-groupby) form — production partitions go through
    ``_bucket_rollup_partition``; the equality test pins the two."""
    bucket = (np.floor(out["t"].to_numpy() / sec) * sec).astype("int64")
    vals = out["value"]
    g = vals.groupby(bucket)
    agg = pd.DataFrame(
        {
            "cnt": g.count().astype("int64"),
            "vsum": g.sum(min_count=1),
            "vmin": g.min(),
            "vmax": g.max(),
            "vfirst": g.nth(0).to_numpy(),
            "vlast": g.nth(-1).to_numpy(),
        }
    ).reset_index(names="bucket_start")
    agg.insert(0, "series_key", key)
    return agg[["series_key", "bucket_start", "cnt", "vsum", "vmin", "vmax", "vfirst", "vlast"]]


def correct_rollup_lineage(
    points: DataFrame,
    tier: str = "1m",
    config: dict[str, Any] | None = None,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """``correct_and_rollup`` that ALSO emits per-series lineage rows from
    the SAME kernel execution — rollup and lineage in one pass over raw
    points, instead of ``lineage_for`` re-running the detectors in a second
    full pass (the pipeline's dominant stage, previously executed twice).

    Output is a union-typed table discriminated by ``row_kind``:
    ``'rollup'`` rows carry the ROLLUP columns (lineage columns null),
    ``'lineage'`` rows carry the LINEAGE columns (rollup columns null).
    Callers split with a filter; written ``partitionBy('row_kind')`` the
    split is a pruned directory read, not a scan.
    """
    from ..schema import ROLLUP_WITH_LINEAGE, TIER_SECONDS

    sec = TIER_SECONDS[tier]
    cfg = {**oracle.DEFAULT_CONFIG, **(config or {})}
    if num_partitions is None:
        num_partitions = points.sparkSession.sparkContext.defaultParallelism * 2

    roll_cols = ["bucket_start", "cnt", "vsum", "vmin", "vmax", "vfirst", "vlast"]
    lin_cols = ["step", "n_detected", "n_rows_in", "n_rows_out", "detail"]
    out_cols = ["series_key"] + roll_cols + lin_cols + ["row_kind"]

    def _process_partition(batches):
        # r6: factorize + array-native process_tv (see correct_series)
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        karr = pdf[key_col].to_numpy()
        t = pdf[time_col].to_numpy(dtype=np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        del pdf, chunks
        codes, uniques = pd.factorize(karr)
        order = np.argsort(codes, kind="stable")
        order = order[int((codes == -1).sum()) :]
        t, v, codes = t[order], v[order], codes[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(codes) else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], len(codes)] if len(starts) else starts
        key_arr = np.asarray(uniques, dtype=object)
        ts_list, vs_list, keys, lin_rows = [], [], [], []
        for s, e in zip(starts, ends):
            key = key_arr[codes[s]]
            t_out, v_out, stats = oracle.process_tv(t[s:e], v[s:e], cfg)
            ts_list.append(t_out)
            vs_list.append(v_out)
            keys.append(key)
            lin_rows.extend(
                (key, st, int(d), int(i), int(o), det) for st, d, i, o, det in stats
            )
        agg = _bucket_rollup_partition(ts_list, vs_list, keys, sec)
        # the absent side's columns get explicit dtypes (nullable Int64 /
        # float64 / object) so the concat is dtype-stable
        agg["step"] = None
        for c in ("n_detected", "n_rows_in", "n_rows_out"):
            agg[c] = pd.array([None] * len(agg), dtype="Int64")
        agg["detail"] = None
        agg["row_kind"] = "rollup"
        lin = pd.DataFrame(lin_rows, columns=["series_key"] + lin_cols)
        for c in ("n_detected", "n_rows_in", "n_rows_out"):
            lin[c] = lin[c].astype("Int64")
        for c in ("bucket_start", "cnt"):
            lin[c] = pd.array([None] * len(lin), dtype="Int64")
        for c in ("vsum", "vmin", "vmax", "vfirst", "vlast"):
            lin[c] = np.nan
        lin["row_kind"] = "lineage"
        yield pd.concat([agg[out_cols], lin[out_cols]], ignore_index=True)

    return points.repartition(num_partitions, key_col).mapInPandas(
        _process_partition, schema=ROLLUP_WITH_LINEAGE
    )


def correct_series_chunked(
    points: DataFrame,
    config: dict[str, Any] | None = None,
    chunk_sec: float = 365.0 * 86400,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Skew-capped variant: split each series into fixed time chunks (default
    1 year, matching the reference's year-file decomposition), correct each
    chunk independently in parallel, then realign chunk boundaries with the
    reference's level-shift rule (tail-5 vs head-5 non-zero averages,
    chained cumulatively — scripts/apply_refined_corrections.py:167-194).

    Group key becomes (series_key, chunk), so one hot series spreads over
    many tasks. Trade-off vs ``correct_series``: detection near chunk edges
    sees less context (exactly like the reference's per-year files).
    """
    from .level_shift import apply_boundary_shifts

    chunked = points.withColumn("chunk", (F.col(time_col) / F.lit(chunk_sec)).cast("long"))

    cfg = {**oracle.DEFAULT_CONFIG, **(config or {})}

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        chunk = pdf["chunk"].iloc[0]
        frame = pdf[[time_col, value_col]].rename(columns={time_col: "t", value_col: "value"})
        out = oracle.process_series(frame, "t", "value", cfg)
        out.insert(0, "series_key", key)
        out.insert(1, "chunk", chunk)
        return out[["series_key", "chunk", "t", "value"]]

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("series_key", T.StringType()),
            T.StructField("chunk", T.LongType()),
            T.StructField("t", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    corrected = chunked.groupBy(key_col, "chunk").applyInPandas(_kernel, schema=schema)
    return apply_boundary_shifts(
        corrected, key_col=key_col, chunk_col="chunk", time_col="t", value_col="value"
    ).select("series_key", "t", "value")


def detect_gaps_native(
    points: DataFrame,
    threshold_factor: float = 3.0,
    key_col: str = "series_key",
    time_col: str = "t",
) -> DataFrame:
    """Gap DETECTION as pure built-in Spark (no Python) — the fast path.

    Matches oracle.detect_gaps: per series, flag rows whose distance to the
    previous sample exceeds ``threshold_factor`` × the exact median interval
    (reference scripts/processor.py:46-115). Exact ``median`` aggregate +
    lag window; one shuffle, whole-stage codegen throughout.

    Returns (series_key, t, prev_t, delta) rows that START after a gap.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(time_col)
    with_delta = points.withColumn("prev_t", F.lag(time_col).over(w)).withColumn(
        "delta", F.col(time_col) - F.col("prev_t")
    )
    med = with_delta.where(F.col("delta").isNotNull()).groupBy(key_col).agg(
        F.median("delta").alias("median_delta")
    )
    return (
        with_delta.join(F.broadcast(med), key_col)
        .where(
            (F.col("median_delta") > 0)
            & (F.col("delta") > F.lit(threshold_factor) * F.col("median_delta"))
        )
        .select(key_col, time_col, "prev_t", "delta")
    )


def global_mad_correct_native(
    points: DataFrame,
    threshold: float = 3.0,
    key_col: str = "series_key",
    value_col: str = "value",
) -> DataFrame:
    """The reference's global-MAD outlier variant in PURE native Spark SQL —
    no Python in the hot path (updated_processor.py:27-54 semantics).

    Per series: median, MAD = median(|v − median|) floored at 1e-4,
    z = 0.6745·|v − median|/MAD; z > threshold ⇒ replace with median.
    Adds columns ``corrected`` and ``is_outlier``.
    """
    med = points.groupBy(key_col).agg(F.median(value_col).alias("gmedian"))
    with_med = points.join(F.broadcast(med), key_col)
    mad = (
        with_med.groupBy(key_col)
        .agg(F.median(F.abs(F.col(value_col) - F.col("gmedian"))).alias("gmad"))
        .withColumn("gmad", F.greatest(F.col("gmad"), F.lit(MAD_FLOOR)))
    )
    z = F.lit(Z_CONST) * F.abs(F.col(value_col) - F.col("gmedian")) / F.col("gmad")
    flagged = F.when(z > threshold, True).otherwise(False)
    return (
        with_med.join(F.broadcast(mad), key_col)
        .withColumn("is_outlier", F.coalesce(flagged, F.lit(False)))
        .withColumn(
            "corrected",
            F.when(F.col("is_outlier"), F.col("gmedian")).otherwise(F.col(value_col)),
        )
        .drop("gmedian", "gmad")
    )


def lineage_for(points: DataFrame, config: dict[str, Any] | None = None) -> DataFrame:
    """Per-series lineage rows: what each correction step detected/changed.

    Mirrors the reference's correction-log record
    (scripts/apply_refined_corrections.py:185-194) at series granularity.
    Standalone lineage-only job; the PIPELINE does not use this — it gets
    the identical rows for free from ``correct_rollup_lineage``'s single
    kernel pass (same ``process_series_with_stats`` underneath).
    """
    from ..schema import LINEAGE

    cfg = {**oracle.DEFAULT_CONFIG, **(config or {})}

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["series_key"].iloc[0]
        frame = pdf[["t", "value"]]
        _out, stats = oracle.process_series_with_stats(frame, "t", "value", cfg)
        return pd.DataFrame(
            [(key, s, int(d), int(i), int(o), det) for s, d, i, o, det in stats],
            columns=["series_key", "step", "n_detected", "n_rows_in", "n_rows_out", "detail"],
        )

    return points.groupBy("series_key").applyInPandas(_kernel, schema=LINEAGE)
