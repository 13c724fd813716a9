"""Year/chunk-boundary level-shift alignment — native Spark.

Distributed form of the reference's ``apply_refined_corrections`` pipeline
(scripts/apply_refined_corrections.py:167-194): per series, align each
chunk's head with the previous chunk's tail using 5-row non-zero averages;
shifts chain cumulatively across chunks because the reference mutates files
in place and reuses them (test_apply_refined_corrections.py:79-130), which
collapses to a running-sum window over raw boundary deltas:

    C[k] = Σ_{j ≤ k} (tail_raw[j−1] − head_raw[j])

This is the one reference pipeline that is MORE natural in Spark than in
pandas: two small aggregates, a lag, a cumulative window, one join back.
All JVM-side, whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def boundary_shifts(
    points: DataFrame,
    key_col: str = "series_key",
    chunk_col: str = "chunk",
    time_col: str = "t",
    value_col: str = "value",
    head_n: int = 5,
) -> DataFrame:
    """Per (series, chunk): cumulative level shift to apply.

    Head/tail averages take the first/last ``head_n`` ROWS in time order and
    average the non-zero, non-null values among them (0.0 when none) —
    reference semantics of ``calculate_non_zero_average`` over ``.iloc[:5]``
    / ``.iloc[-5:]`` (apply_refined_corrections.py:21-28, 175-180).
    """
    w_asc = Window.partitionBy(key_col, chunk_col).orderBy(F.col(time_col).asc())
    w_desc = Window.partitionBy(key_col, chunk_col).orderBy(F.col(time_col).desc())
    ranked = points.select(
        key_col,
        chunk_col,
        value_col,
        F.row_number().over(w_asc).alias("rn_head"),
        F.row_number().over(w_desc).alias("rn_tail"),
    ).where((F.col("rn_head") <= head_n) | (F.col("rn_tail") <= head_n))

    nz = F.when(F.col(value_col) != 0, F.col(value_col))  # nulls auto-skipped by avg
    per_chunk = ranked.groupBy(key_col, chunk_col).agg(
        F.coalesce(F.avg(F.when(F.col("rn_head") <= head_n, nz)), F.lit(0.0)).alias("head_avg"),
        F.coalesce(F.avg(F.when(F.col("rn_tail") <= head_n, nz)), F.lit(0.0)).alias("tail_avg"),
    )

    w_chunks = Window.partitionBy(key_col).orderBy(chunk_col)
    delta = F.col("prev_tail") - F.col("head_avg")
    return (
        per_chunk.withColumn("prev_tail", F.lag("tail_avg").over(w_chunks))
        .withColumn("boundary_delta", F.when(F.col("prev_tail").isNotNull(), delta).otherwise(0.0))
        .withColumn(
            "shift",
            F.sum("boundary_delta").over(
                w_chunks.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(key_col, chunk_col, "head_avg", "tail_avg", "shift")
    )


def apply_boundary_shifts(
    points: DataFrame,
    key_col: str = "series_key",
    chunk_col: str = "chunk",
    time_col: str = "t",
    value_col: str = "value",
    head_n: int = 5,
) -> DataFrame:
    """Add each chunk's cumulative shift to all its rows."""
    shifts = boundary_shifts(points, key_col, chunk_col, time_col, value_col, head_n)
    return points.join(shifts.select(key_col, chunk_col, "shift"), [key_col, chunk_col]).withColumn(
        value_col, F.col(value_col) + F.col("shift")
    ).drop("shift")
