"""Per-partition checkpoint/resume for batch jobs.

The reference resumes nothing — a crash reruns the whole sequential loop
(scripts/batch_correction.py:643-663). At 10^12 rows restartability is a
requirement (north_rule: "resume from per-partition checkpoints with lineage
+ metrics tables").

Design (idempotent, no coordination service):
- work is split by a deterministic partition key ``pkey = xxhash64(series_key)
  % n_buckets`` — the SAME hash partitioning the correction shuffle uses, so
  checkpoint granularity aligns with shuffle granularity;
- each bucket's output is written to ``out/pkey=<k>/`` via dynamic partition
  overwrite (rewriting a bucket is idempotent);
- a ``_checkpoints`` parquet table records completed buckets per job_id;
- on restart, completed buckets are skipped by partition pruning
  (``~pkey.isin(done)`` reaches the scan).

On real Iceberg this maps to overwrite-by-partition + snapshot metadata; the
mechanism here uses plain parquet so it runs anywhere.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_partition_key(df: DataFrame, key_col: str = "series_key", n_buckets: int = 32) -> DataFrame:
    """Salted-hash bucket column (north_rule partitioning)."""
    return df.withColumn("pkey", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, ckpt_dir: str, job_id: str) -> list[int]:
    path = os.path.join(ckpt_dir, "_checkpoints")
    try:
        df = spark.read.parquet(path)
    except Exception:
        return []
    return [r.pkey for r in df.where(F.col("job_id") == job_id).select("pkey").distinct().collect()]


def mark_completed(spark: SparkSession, ckpt_dir: str, job_id: str, pkeys: list[int]) -> None:
    path = os.path.join(ckpt_dir, "_checkpoints")
    rows = [(job_id, int(k), float(time.time())) for k in pkeys]
    spark.createDataFrame(rows, "job_id string, pkey int, completed_at double").write.mode(
        "append"
    ).parquet(path)


def run_with_checkpoints(
    spark: SparkSession,
    points: DataFrame,
    transform,
    out_dir: str,
    job_id: str,
    key_col: str = "series_key",
    n_buckets: int = 32,
    buckets_per_wave: int = 8,
) -> int:
    """Run ``transform(bucketed_df) -> DataFrame`` over hash buckets in waves,
    checkpointing each completed wave; resumes by skipping completed buckets.

    Returns the number of buckets processed this invocation.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = with_partition_key(points, key_col, n_buckets)
    done = set(completed_buckets(spark, out_dir, job_id))
    todo = [k for k in range(n_buckets) if k not in done]
    processed = 0
    for i in range(0, len(todo), buckets_per_wave):
        wave = todo[i : i + buckets_per_wave]
        subset = bucketed.where(F.col("pkey").isin(wave))
        result = transform(subset)
        if "pkey" not in result.columns:
            result = with_partition_key(result, key_col, n_buckets)
        result.write.mode("overwrite").partitionBy("pkey").parquet(os.path.join(out_dir, "data"))
        mark_completed(spark, out_dir, job_id, wave)
        processed += len(wave)
    return processed
