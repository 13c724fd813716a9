"""Streaming ingest dedup: the (key, t)-unique contract on the live path.

Batch ingest enforces store uniqueness via ``operators/ingest.dedup_points``
(greatest-version/value winner). On the streaming path the same contract is
``dropDuplicatesWithinWatermark`` keyed on ``(url, warc_ts)``: state holds
one entry per distinct key seen inside the watermark horizon and expires
with it — bounded, TTL'd, no unbounded dedup map.

Winner semantics differ by construction and that difference is the point:
a stream cannot wait for a better row, so FIRST arrival wins here, while
batch dedup picks a deterministic best row. The two compose instead of
conflicting — the duplicates a stream actually sees are at-least-once
redeliveries and mirrored captures carrying IDENTICAL payloads (first
arrival is exactly right), while genuinely conflicting re-fetches are
reconciled later by the batch layer (``upsert_points`` last-write-wins,
``refresh_tier`` re-aggregates the touched buckets), the same
late-data path every other tier correction already takes.

Downstream composes in one query: dedup → ``streaming_rollup`` is two
stateful operators in append mode (dedup-then-windowed-agg is one of the
operator chains Structured Streaming supports; asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    pages_stream: DataFrame,
    watermark: str = "10 minutes",
    key_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Drop duplicate ``(key_col, ts_col)`` rows within the watermark.

    First arrival wins; state per key expires once the watermark passes
    its event time. Duplicates farther apart than the watermark are by
    definition late data — the batch upsert/refresh path owns those.
    """
    return pages_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col, ts_col]
    )
