"""Streaming time-weighted tier: closed buckets bit-equal the batch
rollup (fractional timestamps included), frontier/skip policies."""

import numpy as np
import pandas as pd

from series_correction_project_updated_spark.operators.timeweight import time_weighted_rollup
from series_correction_project_updated_spark.streaming.timeweight_stream import timeweight_stream


def _tw_pdf(seed=29, n=400, keys=("a", "b", "c")):
    rng = np.random.default_rng(seed)
    frames = []
    for k in keys:
        # irregular fractional inter-arrivals: exercises the JVM
        # timestamp quantization and multi-bucket segment splitting
        dt = rng.exponential(17.0, n) + 0.25
        t = 1.7e9 + np.cumsum(dt)
        v = np.cumsum(rng.normal(0.0, 1.0, n)) + 50.0
        frames.append(pd.DataFrame({"series_key": k, "t": t, "value": v}))
    return pd.concat(frames, ignore_index=True)


def _run_stream(spark, tmp_path, pdf, name, **kw):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / f"src_{name}"
    src.mkdir()
    cut = len(pdf) // 2
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:cut]), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        timeweight_stream(stream, "1m", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[cut:]), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()
    return (
        spark.sql(f"SELECT * FROM {name}")
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )


def _closed_batch(spark, pdf, **kw):
    batch = (
        time_weighted_rollup(spark.createDataFrame(pdf), "1m", **kw)
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    # the stream never closes the bucket holding each key's frontier
    last_t = pdf.groupby("series_key")["t"].max()
    open_b = (np.floor(last_t / 60.0) * 60.0).astype("int64")
    return batch[
        batch["bucket_start"] != batch["series_key"].map(open_b)
    ].reset_index(drop=True)


def test_closed_buckets_bit_equal_batch(spark, tmp_path):
    """Two micro-batches; every CLOSED bucket equals the batch
    time_weighted_rollup row bit-for-bit — same piece geometry, same
    left-fold association, same JVM timestamp quantization."""
    pdf = _tw_pdf()
    got = _run_stream(spark, tmp_path, pdf, "tw_stream_t")
    closed = _closed_batch(spark, pdf)
    assert len(got) == len(closed) > 100
    for col in got.columns:
        np.testing.assert_array_equal(
            got[col].to_numpy(), closed[col].to_numpy(), err_msg=col
        )


def test_locf_and_max_gap_bit_equal(spark, tmp_path):
    pdf = _tw_pdf(seed=31, n=300, keys=("x", "y"))
    kw = {"method": "locf", "max_gap_sec": 45.0}
    got = _run_stream(spark, tmp_path, pdf, "tw_stream_locf", **kw)
    closed = _closed_batch(spark, pdf, **kw)
    assert len(got) == len(closed) > 30
    for col in got.columns:
        np.testing.assert_array_equal(
            got[col].to_numpy(), closed[col].to_numpy(), err_msg=col
        )


def test_out_of_order_skipped_and_edge_frontier(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src_tw_ooo"
    src.mkdir()
    # t=60 lands EXACTLY on a bucket edge: bucket 0 closes with the
    # full [0,60) integral, bucket 60 stays open with zero coverage
    b0 = pd.DataFrame(
        {"series_key": "k", "t": [0.0, 30.0, 60.0], "value": [1.0, 3.0, 5.0]}
    )
    # t=10 is late (skipped); t=150 closes bucket 60
    b1 = pd.DataFrame({"series_key": "k", "t": [10.0, 150.0], "value": [99.0, 5.0]})
    pq.write_table(pa.Table.from_pandas(b0), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        timeweight_stream(stream, "1m")
        .writeStream.format("memory")
        .queryName("tw_stream_ooo")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(b1), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = (
        spark.sql("SELECT * FROM tw_stream_ooo")
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    assert got["bucket_start"].tolist() == [0, 60]
    # bucket 0: trapezoids (1+3)/2*30 + (3+5)/2*30 = 60 + 120 = 180
    assert got.loc[0, "integral"] == 180.0 and got.loc[0, "covered_sec"] == 60.0
    # bucket 60: flat v=5 from 60 to 120 -> 300; late t=10 never contributes
    assert got.loc[1, "integral"] == 300.0 and got.loc[1, "covered_sec"] == 60.0
