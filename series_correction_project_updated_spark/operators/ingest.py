"""Point-store ingest: the upsert that maintains the uniqueness contract.

The whole storage stack downstream assumes ``(series_key, t)`` is unique
in the point store — ``rollup``'s default hash-aggregable ``min_by``
first/last pick (operators/rollup.py), ``refresh_tier``'s bucket
recompute, and the correction kernel's per-series frames all rely on it.
Web-crawl input breaks it naturally: a url re-fetched at the same
``warc_ts`` (retries, mirrored captures) lands twice. This module is the
single place the contract is enforced:

- ``dedup_points`` — collapse duplicate ``(series_key, t)`` rows inside
  one batch, deterministically: highest ``version_col`` wins when given
  (e.g. a fetch sequence number), else the row with the greatest
  ``value`` (an arbitrary but total order, so re-runs and retries
  produce identical stores).
- ``upsert_points`` — last-write-wins merge of a deduped batch into the
  standing store: batch rows replace store rows at the same key, all
  other store rows pass through untouched.

Scale shape: on the canonical 3-column point schema ``(key, t, value)``
with no version column, dedup is a plain ``max(value)`` hash aggregate —
primitive buffer, HashAggregateExec with map-side partials (asserted in
tests; a duplicate-heavy batch shrinks map-side). Wider schemas pick the
whole winning row via a struct ``max_by``, which Catalyst can only plan
as SortAggregate — acceptable because dedup always runs on the BATCH (a
trickle), never the store. The upsert anti-join shuffles on the store's
own clustering key ``(series_key, t)``, and on a day-partitioned store
(``refresh.write_points_partitioned``) ``prune_partition_col`` restricts
the collision check to the days the batch touches — identical mechanism
(and soundness argument) to ``refresh_tier``: every point's day derives
from ``t``, so rows outside the touched days cannot collide with the
batch. At 10^12 rows an ingest run rewrites a handful of day
directories, never the store.

No reference counterpart (the reference loads whole files single-node);
this is the ingest edge of the rollup/retention engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import utc_day


def dedup_points(
    batch: DataFrame,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    version_col: str | None = None,
) -> DataFrame:
    """Collapse duplicate ``(key, t)`` rows to one, deterministically.

    Winner: greatest ``version_col`` if given, else greatest
    ``value_col``. On the bare ``(key, t, value)`` schema this is a pure
    primitive ``max`` (HashAggregate — the fast path); wider schemas pick
    the winning ROW via ``max_by`` over an all-columns ordering struct (a
    total order over row content — rows that still tie are identical, so
    the choice is immaterial), which plans as SortAggregate. Output
    carries the batch's columns either way.
    """
    bare = set(batch.columns) == {key_col, time_col, value_col} and version_col is None
    if bare:
        return batch.groupBy(key_col, time_col).agg(F.max(value_col).alias(value_col))

    order_cols = [version_col] if version_col else [value_col]
    others = [c for c in batch.columns if c not in (key_col, time_col, *order_cols)]
    ord_struct = F.struct(*[F.col(c) for c in (*order_cols, *others)])
    row_struct = F.struct(*[F.col(c) for c in batch.columns])
    picked = batch.groupBy(key_col, time_col).agg(
        F.max_by(row_struct, ord_struct).alias("_row")
    )
    return picked.select(*[F.col(f"_row.{c}").alias(c) for c in batch.columns])


def upsert_points(
    store: DataFrame,
    batch: DataFrame,
    key_col: str = "series_key",
    time_col: str = "t",
    value_col: str = "value",
    version_col: str | None = None,
    prune_partition_col: str | None = None,
) -> DataFrame:
    """Last-write-wins merge of ``batch`` into ``store``.

    The batch is deduped first (``dedup_points``); batch rows then
    replace store rows at the same ``(key, t)`` via an anti-join. With
    ``prune_partition_col`` (a UTC-day column as written by
    ``refresh.write_points_partitioned``), only store partitions for the
    batch's touched days enter the anti-join; untouched days are unioned
    through as-is, so the collision check never scans them. The touched
    date list is collected driver-side — bounded, an ingest batch spans
    few days.

    Output columns = store's columns (batch must carry them all).
    """
    clean = dedup_points(batch, key_col, time_col, value_col, version_col)
    if prune_partition_col is not None and prune_partition_col not in clean.columns:
        # batches arrive without the storage layout column — derive it
        # with the same pure-UTC-day arithmetic the store was written with
        clean = clean.withColumn(prune_partition_col, utc_day(time_col))
    clean = clean.select(*store.columns)
    if prune_partition_col is not None:
        # day set from the RAW batch (dedup cannot change it): one cheap
        # scan instead of re-running the dedup aggregation for the collect.
        # None is dropped from the list — a null in an isin() list makes
        # the predicate NULL for every non-match, which would silently
        # empty the untouched leg below. A null-day batch row (null t —
        # contract-violating) cannot collide with any day partition and
        # simply unions through.
        day_src = (
            F.col(prune_partition_col)
            if prune_partition_col in batch.columns
            else utc_day(time_col)
        )
        dates = [
            r[0]
            for r in batch.select(day_src.alias("d")).distinct().collect()
            if r[0] is not None
        ]
        touched = store.filter(F.col(prune_partition_col).isin(dates))
        # null-safe: a null partition value fails BOTH isin and ~isin under
        # three-valued logic — route such rows (contract-violating but
        # possible in a hand-written store) through untouched, never drop
        untouched = store.filter(
            ~F.col(prune_partition_col).isin(dates)
            | F.col(prune_partition_col).isNull()
        )
    else:
        touched, untouched = store, None

    kept = touched.join(
        clean.select(key_col, time_col), [key_col, time_col], "left_anti"
    )
    out = kept.unionByName(clean)
    if untouched is not None:
        out = untouched.unionByName(out)
    return out
