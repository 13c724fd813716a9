"""The UTC-day expression every partition layout in the engine shares.

``refresh.write_points_partitioned``, ``retention.write_tier_partitioned``,
``bucketstore.write_points_bucketed(partition_by_day=True)``, ingest's
batch-day derivation, and every pruning path that collects touched days
MUST all compute the day from the same expression, or partition pruning
against a store written by one of the others becomes unsound. Keeping the
expression here makes that invariant structural instead of a
copy-discipline promise.

Pure integer-day arithmetic — ``date_from_unix_date(floor(sec / 86400))``
— NOT ``to_date(timestamp_seconds(...))``, which follows
``spark.sql.session.timeZone`` and would let a non-UTC session write live
rows into a directory the UTC-based expiry considers dead (r3 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def utc_day(seconds: Column | str) -> Column:
    """Epoch-seconds → UTC calendar date, session-timezone independent."""
    col = F.col(seconds) if isinstance(seconds, str) else seconds
    return F.date_from_unix_date(F.floor(col / 86400).cast("int"))
