"""Streaming ingest dedup: uniqueness contract + composition with the tier."""

from pyspark.sql import functions as F

from series_correction_project_updated_spark.sources.synth import generate_pages
from series_correction_project_updated_spark.streaming.ingest_stream import streaming_dedup
from series_correction_project_updated_spark.streaming.rollup_stream import (
    run_stream_to_parquet,
    streaming_rollup,
)


def _dup_pages(spark, tmp_path):
    """Pages with planted duplicate (url, warc_ts) rows written for a file
    stream: identical-payload redeliveries (the case streams actually see)."""
    pages = generate_pages(spark, n_urls=5, samples_per_url=30)
    dups = pages.sample(0.3, seed=3)
    src = str(tmp_path / "src")
    pages.unionByName(dups).write.parquet(src)
    return pages, src


def test_streaming_dedup_unique_per_key(spark, tmp_path):
    pages, src = _dup_pages(spark, tmp_path)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("dedup_sink")
    n = got.count()
    assert n == got.select("url", "warc_ts").distinct().count()
    assert n == pages.select("url", "warc_ts").distinct().count()


def test_streaming_dedup_composes_with_rollup(spark, tmp_path):
    """dedup -> windowed rollup in ONE query (two chained stateful
    operators, append mode); emitted buckets must match the batch rollup
    over the deduped input — i.e. duplicates influence nothing."""
    pages, src = _dup_pages(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = run_stream_to_parquet(
        streaming_rollup(streaming_dedup(stream), "1h", watermark=None), out, ckpt
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() > 0
    batch = (
        pages.dropDuplicates(["url", "warc_ts"])
        .groupBy(F.col("url").alias("series_key"), F.window("warc_ts", "1 hour").alias("w"))
        .agg(F.count("signal").alias("cnt"))
        .select("series_key", F.unix_timestamp("w.start").alias("bucket_start"), "cnt")
    )
    joined = got.select("series_key", "bucket_start", "cnt").join(
        batch.withColumnRenamed("cnt", "cnt_b"), ["series_key", "bucket_start"]
    )
    assert joined.where(F.col("cnt") != F.col("cnt_b")).count() == 0
