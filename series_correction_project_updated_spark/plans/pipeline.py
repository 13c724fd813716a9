"""The flagship end-to-end job: pages → series → correct → rollup tiers →
compress, with lineage + metrics side tables and per-partition resume.

Distributed replacement for the reference's ``batch_process`` driver loop
(scripts/batch_correction.py:461-516): config on the driver, data never on
the driver. One shuffle for the correction (hash by series), cascade rollups
reuse the clustering, sinks are partition-overwrite idempotent.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.compress import bytes_per_point, compress_rollup
from ..operators.correct import correct_and_rollup, correct_rollup_lineage
from ..operators.rollup import cascade
from ..schema import LINEAGE, ROLLUP, TIER_SECONDS
from ..sources.synth import pages_to_series


@dataclass
class PipelineConfig:
    """Mirrors the reference's merged config (processor.py:468-481) plus
    engine knobs."""

    correction: dict[str, Any] = field(default_factory=dict)
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    compress_tier: str = "1m"
    compress_value_col: str = "vsum"
    n_buckets: int = 32
    emit_lineage: bool = True
    # NOTE deliberately NO retention knob here: retention must not filter a
    # tier before a COARSER tier cascades from it (coarser tiers keep longer
    # horizons), so expiry is a separate maintenance job over the written
    # tier stores — jobs/run_retention.py + operators/retention.py — exactly
    # how production continuous-aggregate policies run (background job, not
    # build-time filter).


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    config: PipelineConfig | None = None,
    job_id: str | None = None,
) -> dict[str, Any]:
    """Execute the full pipeline, writing per-tier parquet + lineage +
    metrics under ``out_dir``. Returns a summary dict."""
    cfg = config or PipelineConfig()
    job_id = job_id or uuid.uuid4().hex[:12]
    t_start = time.time()

    # The coarser-tier cascade below derives each tier from the previous
    # one, which is only sound for nested tiers ordered finest→coarsest.
    secs = [TIER_SECONDS[t] for t in cfg.tiers]
    for prev, nxt in zip(secs, secs[1:]):
        if nxt <= prev or nxt % prev != 0:
            raise ValueError(
                f"cfg.tiers must be finest-to-coarsest with each tier an exact "
                f"multiple of the previous; got {cfg.tiers} ({secs}s)"
            )

    points = pages_to_series(pages)

    # Finest tier comes out of the kernel FUSED: one shuffle, no post-kernel
    # JVM aggregation, no persist of the raw corrected points. With lineage
    # enabled, lineage rows come out of the SAME kernel execution
    # (correct_rollup_lineage) — the expensive raw-point pass runs exactly
    # once, and the row_kind partitioning makes the rollup/lineage split a
    # pruned directory read. Coarser tiers cascade from the sink (each read
    # is ~60× smaller than raw).
    tier_counts: dict[str, int] = {}
    tiers: dict[str, DataFrame] = {}
    finest = cfg.tiers[0]
    fine_path = os.path.join(out_dir, f"rollup_{finest}")
    corrected_rows = None
    if cfg.emit_lineage:
        fused = correct_rollup_lineage(points, finest, cfg.correction, num_partitions=cfg.n_buckets)
        fused_path = os.path.join(out_dir, f"fused_{finest}")
        fused.write.mode("overwrite").partitionBy("row_kind").parquet(fused_path)
        fused_sink = spark.read.parquet(fused_path)
        lineage = fused_sink.where(F.col("row_kind") == "lineage").select(
            *[f.name for f in LINEAGE.fields]
        )
        lineage.write.mode("overwrite").parquet(os.path.join(out_dir, "lineage"))
        lower = fused_sink.where(F.col("row_kind") == "rollup").select(
            *[f.name for f in ROLLUP.fields]
        )
        lower.write.mode("overwrite").parquet(fine_path)
        # Row count INCLUDING null-valued rows (e.g. all-NaN series that
        # interpolation cannot fill): the kernel's post-gap row count.
        corrected_rows = int(
            spark.read.parquet(os.path.join(out_dir, "lineage"))
            .where(F.col("step") == "gaps")
            .agg(F.sum("n_rows_out"))
            .collect()[0][0]
            or 0
        )
    else:
        r_fine = correct_and_rollup(points, finest, cfg.correction, num_partitions=cfg.n_buckets)
        r_fine.write.mode("overwrite").parquet(fine_path)
    lower = spark.read.parquet(fine_path)
    tiers[finest] = lower
    tier_counts[finest] = lower.count()
    # NOTE: counts non-null corrected VALUES (sum of tier cnt), not rows —
    # rows of an all-NaN series are excluded; see corrected_rows for rows.
    n_corrected = int(lower.agg(F.sum("cnt")).collect()[0][0] or 0)
    for name in cfg.tiers[1:]:
        path = os.path.join(out_dir, f"rollup_{name}")
        cascade(lower, name).write.mode("overwrite").parquet(path)
        lower = spark.read.parquet(path)
        tiers[name] = lower
        tier_counts[name] = lower.count()

    comp = compress_rollup(tiers[cfg.compress_tier], cfg.compress_tier, cfg.compress_value_col)
    comp_path = os.path.join(out_dir, f"compressed_{cfg.compress_tier}")
    comp.write.mode("overwrite").parquet(comp_path)
    bpp = bytes_per_point(spark.read.parquet(comp_path)).collect()
    bytes_point = float(bpp[0]["bytes_per_point"]) if bpp else None

    wall = time.time() - t_start
    metrics_rows = [
        (job_id, "all", "Processed", int(n_corrected), float(wall)),
    ]
    spark.createDataFrame(
        metrics_rows, "job_id string, partition_key string, status string, records long, wall_sec double"
    ).write.mode("append").parquet(os.path.join(out_dir, "metrics"))

    total_rolled = sum(tier_counts.values())
    return {
        "job_id": job_id,
        "corrected_points": n_corrected,
        "corrected_rows": corrected_rows,
        "tier_counts": tier_counts,
        "rolled_points_total": total_rolled,
        "rolled_points_per_sec": total_rolled / wall if wall > 0 else None,
        "compressed_bytes_per_point": bytes_point,
        "wall_sec": wall,
    }


def verify_text_identity(pages_in: DataFrame, pages_out: DataFrame) -> bool:
    """north_rule invariant check: byte-identical extracted text per url."""
    a = pages_in.select("url", F.md5("text").alias("h")).distinct()
    b = pages_out.select("url", F.md5("text").alias("h")).distinct()
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
