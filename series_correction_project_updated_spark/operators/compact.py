"""Small-file compaction for day-partitioned stores.

Incremental ingest (operators/ingest, operators/refresh) appends a few
files per touched ``bucket_date=`` directory per run; after months of
late batches a hot day holds hundreds of KB-scale files and every scan
pays per-file open/footer overhead (at 100 TB the NameNode/object-store
listing alone starts to dominate). Compaction is the maintenance pass
that restores the layout:

1. ``partition_file_stats`` — one Hadoop-FS ``listStatus`` per partition
   directory (same API as ``retention.expire_partition_dirs``, so
   s3a/hdfs/file URIs all work). Driver-side and bounded: one entry per
   day partition, never per file row.
2. ``compact_partitions`` — for each partition whose file count exceeds
   what its byte size justifies (``ceil(bytes/target_file_bytes)`` plus
   ``min_files`` slack), rewrite JUST that directory: read → coalesce to
   the justified file count → write to a staging dir → atomically swap
   via FS rename. Partitions already in shape are not read, not
   rewritten, not even opened beyond the listing.

Crash safety: the staging rewrite lands under ``_compact_staging/``
(underscore-prefixed — invisible to every parquet reader, so a partial
rewrite can never surface as a bogus partition); the swap is delete-old +
rename-staging, both metadata ops. A crash before the delete leaves the
store untouched (``recover_orphan_staging`` discards the stale staging on
retry); a crash between delete and rename loses availability of that one
partition but not data — the recovery pass finds a staging dir whose
partition is missing and completes the rename. Same guarantee class as
Hive/Spark dynamic partition overwrite, with two metadata ops per
partition instead of a full-table commit.

Rows are preserved exactly (coalesce is a repartition-without-shuffle);
tests checksum before/after and assert untouched partitions keep their
original files (mtime-stable).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


# staging lives under an underscore dir: Spark/parquet readers skip `_*`
# paths, so a crashed half-written rewrite can never surface as a bogus
# partition (a `<dir>.compacting` sibling WOULD — it still starts with
# `bucket_date=` and Spark would parse it as a partition value)
STAGING_DIR = "_compact_staging"


@dataclass
class PartitionStat:
    name: str  # e.g. "bucket_date=2020-01-03"
    files: int
    bytes: int


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def partition_file_stats(spark: SparkSession, store_path: str) -> list[PartitionStat]:
    """File count + byte size per ``bucket_date=`` partition directory."""
    jvm, fs, root = _fs(spark, store_path)
    if not fs.exists(root):
        return []
    out: list[PartitionStat] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("bucket_date=")):
            continue
        files = 0
        nbytes = 0
        for f in fs.listStatus(st.getPath()):
            fname = f.getPath().getName()
            if f.isFile() and not fname.startswith(("_", ".")):
                files += 1
                nbytes += f.getLen()
        out.append(PartitionStat(name=name, files=files, bytes=nbytes))
    return sorted(out, key=lambda s: s.name)


def recover_orphan_staging(spark: SparkSession, store_path: str) -> list[str]:
    """Finish or discard ``_compact_staging/<partition>`` dirs from a crashed run.

    - Partition dir MISSING (crash landed between delete-old and rename):
      the staging dir holds the complete rewrite — rename it into place.
    - Partition dir PRESENT (crash landed mid-write, before the delete):
      the staging dir may be partial and the original is intact — discard
      staging; the retry rewrites it.
    Returns the partitions whose swap was completed.
    """
    jvm, fs, root = _fs(spark, store_path)
    jstage_root = jvm.org.apache.hadoop.fs.Path(root, STAGING_DIR)
    if not fs.exists(jstage_root):
        return []
    completed: list[str] = []
    for st in fs.listStatus(jstage_root):
        part = st.getPath().getName()
        if not st.isDirectory():
            continue
        jpart = jvm.org.apache.hadoop.fs.Path(root, part)
        if fs.exists(jpart):
            fs.delete(st.getPath(), True)
        else:
            # Hadoop FS signals rename failure by RETURNING false, not
            # raising — swallowing it would report a completed swap while
            # the partition stays missing
            if not fs.rename(st.getPath(), jpart):
                raise IOError(f"recovery rename failed: {st.getPath()} -> {jpart}")
            completed.append(part)
    return completed


def compact_partitions(
    spark: SparkSession,
    store_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[str]:
    """Rewrite partitions holding more files than their bytes justify.

    A partition is compacted when ``files > max(min_files,
    ceil(bytes/target_file_bytes))`` — i.e. small stores are left alone
    until fragmentation is real, and big partitions keep ~target-sized
    files. Returns the names of the rewritten partitions.
    """
    jvm, fs, root = _fs(spark, store_path)
    recover_orphan_staging(spark, store_path)
    done: list[str] = []
    for stat in partition_file_stats(spark, store_path):
        justified = max(1, math.ceil(stat.bytes / target_file_bytes))
        if stat.files <= max(min_files, justified):
            continue
        part_dir = f"{store_path}/{stat.name}"
        staging = f"{store_path}/{STAGING_DIR}/{stat.name}"
        jstaging = jvm.org.apache.hadoop.fs.Path(staging)
        (
            spark.read.parquet(part_dir)
            .coalesce(justified)
            .write.mode("overwrite")
            .parquet(staging)
        )
        jpart = jvm.org.apache.hadoop.fs.Path(part_dir)
        if not fs.delete(jpart, True):
            raise IOError(f"compaction delete failed: {jpart}")
        # false return = failed rename (see recover_orphan_staging); the
        # partition is already gone, so failing LOUDLY here (staging still
        # holds the data, recovery completes it) beats reporting success
        if not fs.rename(jstaging, jpart):
            raise IOError(
                f"compaction rename failed: {jstaging} -> {jpart}; "
                f"run recover_orphan_staging to complete the swap"
            )
        done.append(stat.name)
    return done
