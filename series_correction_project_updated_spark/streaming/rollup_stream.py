"""Streaming continuous aggregates (the rollup layer as a live pipeline).

The reference is pure batch (SURVEY.md §2.9) and our engine is batch-first,
but the 1m tier maps naturally onto Structured Streaming: readStream →
watermarked window agg → writeStream. Late pages within the watermark update
their bucket; later ones are handled by the batch re-rollup path
(plans/pipeline.py re-runs affected partitions idempotently).

The streaming tier carries the FULL batch aggregate set — ``min_by`` /
``max_by`` are supported inside streaming aggregations (verified on this
Spark), so ``vfirst``/``vlast`` stream exactly like the batch tier computes
them (r4; earlier rounds carried cnt/sum/min/max only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_DURATION = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def streaming_rollup(
    pages_stream: DataFrame,
    tier: str = "1m",
    watermark: str | None = "10 minutes",
    key_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "signal",
) -> DataFrame:
    """readStream-ready rollup: watermarked tumbling-window aggregate.

    ``watermark=None`` means the stream is already watermarked upstream
    (e.g. ``ingest_stream.streaming_dedup`` in a chained-stateful query —
    redefining a watermark mid-query is disallowed)."""
    if watermark is not None:
        pages_stream = pages_stream.withWatermark(ts_col, watermark)
    return (
        pages_stream
        .groupBy(
            F.col(key_col).alias("series_key"),
            F.window(ts_col, TIER_DURATION[tier]).alias("w"),
        )
        .agg(
            F.count(value_col).alias("cnt"),
            F.sum(value_col).alias("vsum"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
            # struct min/max — same deterministic duplicate-timestamp
            # tie-break as the batch rollup's tie_safe=True form (state
            # stores update per-row, so the struct buffer costs nothing
            # here, unlike batch where it forces SortAggregate)
            F.min(F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")))
            .getField("v")
            .alias("vfirst"),
            F.max(F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")))
            .getField("v")
            .alias("vlast"),
        )
        .select(
            "series_key",
            F.unix_timestamp("w.start").alias("bucket_start"),
            "cnt",
            "vsum",
            "vmin",
            "vmax",
            "vfirst",
            "vlast",
        )
    )


def run_stream_to_parquet(rollup_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Start the stream writing tier rows to parquet (append on watermark close)."""
    return (
        rollup_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
