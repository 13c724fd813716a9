"""Streaming stats tier: closed buckets equal the batch moment sums
(n exact, float sums to reassociation), frontier policy, and
stats_cascade/stats_eval compatibility of the emitted rows."""

import numpy as np
import pandas as pd

from series_correction_project_updated_spark.operators.stats import (
    stats_cascade,
    stats_eval,
    stats_rollup,
)
from series_correction_project_updated_spark.streaming.stats_stream import stats_stream

SUMS = ["sx", "sy", "sxx", "syy", "sxy"]


def _points_pdf(seed=11, n=4000, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    frames = []
    for k in keys:
        vals = rng.normal(20, 5, n) + np.linspace(0, 30, n)  # real trend
        vals[:: n // 9] = np.nan
        frames.append(
            pd.DataFrame(
                {
                    "series_key": k,
                    "t": 1.7e9 + np.sort(rng.uniform(0, 300, n)),
                    "value": vals,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _run_stream(spark, tmp_path, pdf, name, splits=2):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / f"src_{name}"
    src.mkdir()
    chunks = np.array_split(np.arange(len(pdf)), splits)
    pq.write_table(pa.Table.from_pandas(pdf.iloc[chunks[0]]), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        stats_stream(stream, "1m")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    for i, ch in enumerate(chunks[1:], 1):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(pdf.iloc[ch]), str(src / f"b{i}.parquet"))
        q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_closed_buckets_match_batch_moments(spark, tmp_path):
    pdf = _points_pdf()
    got = (
        _run_stream(spark, tmp_path, pdf, "stats_stream_t", splits=3)
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    batch = (
        stats_rollup(spark.createDataFrame(pdf), "1m")
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    open_b = batch.groupby("series_key")["bucket_start"].max()
    closed = batch[
        batch["bucket_start"] != batch["series_key"].map(open_b)
    ].reset_index(drop=True)
    assert len(got) == len(closed) >= 6
    assert got["bucket_start"].tolist() == closed["bucket_start"].tolist()
    assert got["n"].tolist() == closed["n"].tolist()  # exact
    for c in SUMS:
        np.testing.assert_allclose(got[c], closed[c], rtol=1e-12)


def test_late_bucket_skipped_open_bucket_ooo_ok(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src_stats_ooo"
    src.mkdir()
    b0 = pd.DataFrame(
        {"series_key": "k", "t": [0.0, 10.0, 70.0], "value": [1.0, 2.0, 3.0]}
    )
    # t=20 targets CLOSED bucket 0 (skipped); t=65 is out-of-order but
    # inside the OPEN bucket 60 (counted); t=130 closes bucket 60
    b1 = pd.DataFrame(
        {"series_key": "k", "t": [20.0, 65.0, 130.0], "value": [9.0, 4.0, 5.0]}
    )
    pq.write_table(pa.Table.from_pandas(b0), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        stats_stream(stream, "1m")
        .writeStream.format("memory")
        .queryName("stats_stream_ooo")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(b1), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = (
        spark.sql("SELECT * FROM stats_stream_ooo")
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    assert got["bucket_start"].tolist() == [0, 60]
    # bucket 0: (x=0,y=1),(x=10,y=2) — the late t=20 row is skipped
    assert got.loc[0, "n"] == 2 and got.loc[0, "sy"] == 3.0
    assert got.loc[0, "sx"] == 10.0 and got.loc[0, "sxy"] == 20.0
    # bucket 60: in-order (x=10,y=3) plus out-of-order (x=5,y=4)
    assert got.loc[1, "n"] == 2 and got.loc[1, "sy"] == 7.0
    assert got.loc[1, "sx"] == 15.0 and got.loc[1, "sxy"] == 50.0


def test_emitted_rows_feed_cascade_and_eval(spark, tmp_path):
    pdf = _points_pdf(seed=5, n=1800, keys=("x",))
    streamed = _run_stream(spark, tmp_path, pdf, "stats_stream_c", splits=1)
    assert streamed.count() > 0
    via_stream = (
        stats_eval(stats_cascade(streamed, "1h"))
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    batch_1m = stats_rollup(spark.createDataFrame(pdf), "1m")
    closed = batch_1m.where(
        batch_1m.bucket_start
        < batch_1m.agg({"bucket_start": "max"}).collect()[0][0]
    )
    via_batch = (
        stats_eval(stats_cascade(closed, "1h"))
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    assert via_stream["bucket_start"].tolist() == via_batch["bucket_start"].tolist()
    assert via_stream["n"].tolist() == via_batch["n"].tolist()
    for c in ["slope", "corr", "r2", "var_y"]:
        np.testing.assert_allclose(via_stream[c], via_batch[c], rtol=1e-9)
    # the trend actually shows: hourly slope positive
    assert (via_stream["slope"] > 0).all()
