"""Retention / expiry for rollup tiers — the third leg of the
rollup + downsample + RETENTION engine (BASELINE.json north_rule; the
reference repo has no storage layer at all).

Model (the TimescaleDB ``drop_chunks`` / continuous-aggregate-policy
analog): each tier keeps a sliding horizon — e.g. raw 7d, 1m 90d, 1h 2y,
1d forever — and expiry happens at two levels:

* **Logical** (`apply_retention` / `retention_cascade`): a plain
  ``bucket_start ≥ cutoff`` filter. On bucket-partitioned storage this is
  partition PRUNING — Catalyst never reads the expired data. The cutoff
  is either explicit (``now_ts``, production) or derived from the data's
  own max bucket (deterministic mode for tests/oracles — wall-clock in a
  query would break reproducibility).
* **Physical** (`expire_partition_dirs`): drop whole ``bucket_date=...``
  partition directories strictly older than the cutoff. O(#partitions)
  METADATA work, zero data rewrite — the only expiry shape that survives
  100 TB (a filter-and-rewrite of a tier table would be a full-table
  write per policy run). Directories that STRADDLE the cutoff are kept
  (their live rows still prune logically); expiry is therefore
  conservative and idempotent.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default policy, seconds of history kept per tier (None = keep forever)
DEFAULT_POLICY: dict[str, float | None] = {
    "1m": 90 * 86400.0,
    "1h": 2 * 365 * 86400.0,
    "1d": None,
}


def retention_cutoff(
    tier_df: DataFrame,
    keep_seconds: float,
    now_ts: float | None = None,
    time_col: str = "bucket_start",
) -> float:
    """Cutoff epoch-seconds: ``now - keep``. ``now`` defaults to the data's
    max time value (deterministic — reproducible tests/oracles)."""
    if now_ts is None:
        row = tier_df.agg(F.max(time_col).alias("m")).collect()[0]
        now_ts = float(row["m"] if row["m"] is not None else 0.0)
    return now_ts - keep_seconds


def apply_retention(
    tier_df: DataFrame,
    keep_seconds: float | None,
    now_ts: float | None = None,
    time_col: str = "bucket_start",
) -> DataFrame:
    """Rows within the retention horizon. A pure time-column filter —
    partition-prunable, no shuffle, no action beyond the optional
    max-time lookup in deterministic mode. ``time_col='chunk_start'``
    applies the same policy to the COMPRESSED store (whole chunks expire
    together — the chunk span just quantizes the horizon)."""
    if keep_seconds is None:
        return tier_df
    cutoff = retention_cutoff(tier_df, keep_seconds, now_ts, time_col)
    return tier_df.where(F.col(time_col) >= cutoff)


def retention_cascade(
    tiers: dict[str, DataFrame],
    policy: dict[str, float | None] | None = None,
    now_ts: float | None = None,
) -> dict[str, DataFrame]:
    """Apply the per-tier policy to every tier DataFrame."""
    policy = DEFAULT_POLICY if policy is None else policy
    return {
        name: apply_retention(df, policy.get(name), now_ts) for name, df in tiers.items()
    }


def expire_partition_dirs(tier_path: str, cutoff_ts: float) -> list[str]:
    """Drop ``bucket_date=YYYY-MM-DD`` partition directories whose whole
    day lies strictly before ``cutoff_ts``. Returns the removed dirs.

    Metadata-only: no surviving file is read or rewritten. A directory
    containing ANY live bucket (its day ends after the cutoff) is kept —
    conservative, so logical retention remains the source of truth and
    physical expiry just reclaims storage behind it. Local-filesystem
    implementation; on object storage the same walk runs against the
    FileSystem API (list + recursive delete per partition prefix).
    """
    removed: list[str] = []
    if not os.path.isdir(tier_path):
        return removed
    for entry in sorted(os.listdir(tier_path)):
        if not entry.startswith("bucket_date="):
            continue
        day = entry.split("=", 1)[1]
        try:
            day_end = datetime.strptime(day, "%Y-%m-%d").replace(
                tzinfo=timezone.utc
            ).timestamp() + 86400.0
        except ValueError:
            continue  # not a date partition — leave it alone
        if day_end <= cutoff_ts:
            shutil.rmtree(os.path.join(tier_path, entry))
            removed.append(entry)
    return removed


def write_tier_partitioned(tier_df: DataFrame, path: str) -> None:
    """Write a tier partitioned by ``bucket_date`` — the layout
    ``expire_partition_dirs`` (and Catalyst partition pruning) operate on.

    ``bucket_date`` is derived by PURE UTC DAY ARITHMETIC
    (``date_from_unix_date(floor(bucket_start / 86400))``), never via
    ``to_date(timestamp)``: the latter follows ``spark.sql.session.timeZone``
    while ``expire_partition_dirs`` computes day boundaries in UTC, so a
    non-UTC session could otherwise write live rows into a directory the
    delete path considers expired (r3 ADVICE). With this encoding the
    partition layout is identical under any session timezone.
    """
    tier_df.withColumn(
        "bucket_date",
        F.date_from_unix_date(F.floor(F.col("bucket_start") / 86400).cast("int")),
    ).write.mode("overwrite").partitionBy("bucket_date").parquet(path)
