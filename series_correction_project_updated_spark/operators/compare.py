"""Raw-vs-corrected QA/comparison job — the reference's ``export_comparisons``
re-expressed Spark-first.

Reference behavior (scripts/export_comparison_sheets.py:191-263): for each
series, full-outer join the RAW table with the PROCESSED table on time with
``_raw``/``_processed`` suffixes, then attach fresh outlier flags computed on
the raw values (detect_outliers_series = centered rolling median/MAD modified
z-score, scripts/export_comparison_sheets.py:63-140).

Two operators:

* ``rolling_outlier_flags`` — the W3–W5 detector (centered NaN-propagating
  rolling median, rolling MAD, modified z-score with the 1e-6 zero-MAD
  guards) as PURE native Spark: one window, ``collect_list`` + ``sort_array``
  array math, whole-stage-codegen friendly, no Python. Exact-match against
  the Arrow kernel's ``oracle.detect_outliers`` is pinned in pytest, and the
  same math is DuckDB-expressible, so the driver value-checks it.
* ``compare_raw_corrected`` — the merged QA table: full-outer join on
  (series, t), raw/corrected columns side by side, diff, and the fresh
  ``outlier_flag`` on the raw side.

Scale notes: the flags are one window function over the series clustering
(single hash exchange, reused by the join); the join is an equi-join on
(series_key, t) — co-partitioned with the flags output, so AQE plans it
without an extra shuffle of the raw side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MAD_SCALE = 1.4826  # consistency constant, oracle/correction.py:48
_EPS = 1e-6


def _array_median(arr: F.Column, n: int) -> F.Column:
    """Median of a sorted ``n``-element array column (n = window size).

    ``F.get`` (0-based) rather than ``element_at``: edge windows produce
    short arrays, and under ANSI mode out-of-bounds ``element_at`` throws
    while ``get`` returns null (which the callers' full-window gate wants)."""
    s = F.sort_array(arr)
    if n % 2 == 1:
        return F.get(s, n // 2)
    return (F.get(s, n // 2 - 1) + F.get(s, n // 2)) / 2.0


def rolling_outlier_flags(
    points: DataFrame,
    window_size: int = 5,
    threshold: float = 3.0,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Add ``roll_median``, ``abs_diff``, ``is_outlier`` via the reference's
    centered rolling median/MAD modified z-score — fully native Spark.

    Semantics match ``oracle.modified_z_scores`` exactly (pinned in pytest):

    * edges and any window containing a missing value get NO flag (the
      oracle pads with NaN and ``np.median`` propagates NaN);
    * scaled MAD below 1e-6 flags only when |v − median| > threshold·1e-6
      (the zero-MAD guard, reference scripts/discontinuity_utils.py:192-203);
    * otherwise flag when |v − median| / (1.4826·MAD) > threshold.
    """
    half = window_size // 2
    w = Window.partitionBy(key_col).orderBy(time_col).rowsBetween(-half, window_size - 1 - half)
    arr = F.collect_list(value_col).over(w)  # nulls skipped by collect_list
    full = (F.count(F.lit(1)).over(w) == window_size) & (
        F.count(value_col).over(w) == window_size
    )
    med = _array_median(arr, window_size)
    mad = _array_median(F.transform(arr, lambda x: F.abs(x - med)), window_size)
    scaled_mad = mad * F.lit(_MAD_SCALE)
    abs_diff = F.abs(F.col(value_col) - med)
    z_flag = F.when(scaled_mad < _EPS, abs_diff > threshold * _EPS).otherwise(
        abs_diff / scaled_mad > threshold
    )
    return (
        points.withColumn("_full", full)
        .withColumn("roll_median", F.when(F.col("_full"), med))
        .withColumn("abs_diff", F.when(F.col("_full"), abs_diff))
        .withColumn(
            "is_outlier", F.coalesce(F.when(F.col("_full"), z_flag), F.lit(False))
        )
        .drop("_full")
    )


def positional_concat(
    left: DataFrame,
    right: DataFrame,
    order_left: str,
    order_right: str,
    suffixes: tuple[str, str] = ("_raw", "_processed"),
) -> DataFrame:
    """J2 — the reference's POSITIONAL merge fallback: when raw and
    processed share no time column, ``export_comparison_sheets.py:200``
    concatenates them row-by-row (``pd.concat(axis=1)``).

    DISCOURAGED here exactly as there — positional identity is meaningless
    once a correction run inserts or drops rows; prefer the keyed
    ``compare_raw_corrected``. A distributed engine additionally has no
    implicit row order, so the caller MUST name an ordering column per side
    (the reference gets its order implicitly from file layout); rows are
    then paired by rank with a full-outer join, preserving the reference's
    unequal-length behavior (shorter side padded with nulls).
    """
    wl = Window.orderBy(order_left)
    wr = Window.orderBy(order_right)
    lt = left.select(
        F.row_number().over(wl).alias("_pos"),
        *[F.col(c).alias(c + suffixes[0]) for c in left.columns],
    )
    rt = right.select(
        F.row_number().over(wr).alias("_pos"),
        *[F.col(c).alias(c + suffixes[1]) for c in right.columns],
    )
    return lt.join(rt, "_pos", "full_outer").orderBy("_pos").drop("_pos")


def compare_raw_corrected(
    raw: DataFrame,
    corrected: DataFrame,
    window_size: int = 5,
    threshold: float = 3.0,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """The QA table a user validates a correction run with: one row per
    (series, t) seen on EITHER side (full-outer — corrected runs insert gap
    rows, raw rows may disappear), raw and corrected values side by side,
    their difference, and a fresh outlier flag computed on the raw side
    (reference merge at export_comparison_sheets.py:191-200, flags at
    :203-216).

    Output: (series_key, t, value_raw, value_corrected, diff, changed,
    outlier_flag).
    """
    flagged = rolling_outlier_flags(
        raw, window_size, threshold, key_col, time_col, value_col
    ).select(
        F.col(key_col),
        F.col(time_col),
        F.col(value_col).alias("value_raw"),
        F.col("is_outlier").alias("outlier_flag"),
    )
    cor = corrected.select(
        F.col(key_col), F.col(time_col), F.col(value_col).alias("value_corrected")
    )
    joined = flagged.join(cor, on=[key_col, time_col], how="full_outer")
    return joined.select(
        key_col,
        time_col,
        "value_raw",
        "value_corrected",
        (F.col("value_corrected") - F.col("value_raw")).alias("diff"),
        (~F.col("value_corrected").eqNullSafe(F.col("value_raw"))).alias("changed"),
        F.coalesce("outlier_flag", F.lit(False)).alias("outlier_flag"),
    )
