"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full pages→series→correct→rollup pipeline on the
sf0.001 events table. ``queries()``/``oracle_sql()`` — the operator registry
from ``series_correction_project_updated_spark.queries`` (one entry per implemented
operator from SURVEY.md §2 plus the training-data ops; rows-only entries omit
the SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from series_correction_project_updated_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: correct the sf0.001 event series with the Arrow kernel
    FUSED with the 1m tier (one shuffle, no JVM agg), cascade to 1h,
    return the tier table."""
    from series_correction_project_updated_spark.operators.correct import correct_and_rollup
    from series_correction_project_updated_spark.operators.rollup import cascade
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        F.col("user_id").cast("string").alias("series_key"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0).alias("t"),
        "value",
    )
    return cascade(correct_and_rollup(pts, "1m"), "1h")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
