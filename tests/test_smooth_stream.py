"""Streaming EWM smoothing: matches the batch operator on a fully
delivered stream, and state (3 doubles) carries across micro-batches."""

import numpy as np
import pandas as pd

from series_correction_project_updated_spark.operators.smooth import ewma_smooth
from series_correction_project_updated_spark.streaming.smooth_stream import ewma_stream


def _series_pdf(seed=9, n=150, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    rows = []
    for k in keys:
        vals = rng.normal(5.0, 1.0, n)
        vals[n // 2] += 30.0  # planted spike per series
        for i, v in enumerate(vals):
            rows.append((k, 10.0 * (i + 1), float(v)))
    return pd.DataFrame(rows, columns=["series_key", "t", "value"])


def test_stream_matches_batch_operator(spark, tmp_path):
    pdf = _series_pdf()
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        ewma_stream(stream, alpha=0.2)
        .writeStream.format("memory")
        .queryName("smooth_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM smooth_stream")
        .toPandas()
        .sort_values(["series_key", "t"])
        .reset_index(drop=True)
    )
    want = (
        ewma_smooth(spark.createDataFrame(pdf), alpha=0.2)
        .toPandas()
        .sort_values(["series_key", "t"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == len(pdf)
    np.testing.assert_allclose(got["ewma"], want["ewma"], rtol=1e-12)
    np.testing.assert_allclose(got["ewm_std"], want["ewm_std"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["ewm_z"], want["ewm_z"], rtol=1e-8, atol=1e-9)
    # the planted spike is flagged live
    spike = got.loc[got.groupby("series_key")["ewm_z"].idxmax()]
    assert (spike["ewm_z"] > 10).all()


def test_state_carries_across_microbatches(spark, tmp_path):
    """Feeding the same series as two files (two micro-batches under
    availableNow) must continue the recurrences from carried state: the
    concatenated outputs equal the batch operator over the whole series."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = _series_pdf(seed=11, n=100, keys=("k",))
    src = tmp_path / "src_mb"
    src.mkdir()
    first, second = pdf.iloc[:60], pdf.iloc[60:]
    pq.write_table(pa.Table.from_pandas(first), str(src / "b0.parquet"))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        ewma_stream(stream, alpha=0.3)
        .writeStream.format("memory")
        .queryName("smooth_stream_mb")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(second), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = (
        spark.sql("SELECT * FROM smooth_stream_mb")
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    want = (
        ewma_smooth(spark.createDataFrame(pdf), alpha=0.3)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 100
    np.testing.assert_allclose(got["ewma"], want["ewma"], rtol=1e-12)
    np.testing.assert_allclose(got["ewm_std"], want["ewm_std"], rtol=1e-9, atol=1e-12)


def test_out_of_order_rows_skipped(spark, tmp_path):
    """Cross-batch late arrivals (t <= last_t) are dropped, same policy
    as the gap/jump streams."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src_ooo"
    src.mkdir()
    b0 = pd.DataFrame(
        {"series_key": "k", "t": [10.0, 20.0, 30.0], "value": [1.0, 2.0, 3.0]}
    )
    b1 = pd.DataFrame(
        {"series_key": "k", "t": [15.0, 40.0], "value": [99.0, 4.0]}
    )
    pq.write_table(pa.Table.from_pandas(b0), str(src / "b0.parquet"))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        ewma_stream(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("smooth_stream_ooo")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(b1), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT t FROM smooth_stream_ooo").toPandas()["t"].tolist()
    assert sorted(got) == [10.0, 20.0, 30.0, 40.0]  # t=15 late row dropped
