"""Streaming quantile-digest tier: closed buckets bit-equal the batch
rollup (arrays included), digests compose with the batch cascade/eval
surface, out-of-order skip."""

import numpy as np
import pandas as pd

from series_correction_project_updated_spark.operators.quantile import (
    digest_quantiles,
    quantile_rollup,
)
from series_correction_project_updated_spark.streaming.quantile_stream import quantile_stream


def _pdf(seed=37, n=500, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    frames = []
    for k in keys:
        frames.append(
            pd.DataFrame(
                {
                    "series_key": k,
                    "t": 1.7e9 + np.arange(n) * 2.0,  # 30 pts per 1m bucket
                    "value": rng.lognormal(1.0, 0.8, n),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def test_closed_digests_bit_equal_batch(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = _pdf()
    src = tmp_path / "src"
    src.mkdir()
    cut = len(pdf) // 2
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:cut]), str(src / "b0.parquet"))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        quantile_stream(stream, "1m", k=16)
        .writeStream.format("memory")
        .queryName("q_stream_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[cut:]), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = (
        spark.sql("SELECT * FROM q_stream_t")
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    batch = (
        quantile_rollup(spark.createDataFrame(pdf), "1m", k=16)
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    open_b = batch.groupby("series_key")["bucket_start"].max()
    closed = batch[
        batch["bucket_start"] != batch["series_key"].map(open_b)
    ].reset_index(drop=True)
    assert len(got) == len(closed) > 10
    for col in ("series_key", "bucket_start", "n", "vmin", "vmax"):
        np.testing.assert_array_equal(got[col].to_numpy(), closed[col].to_numpy(), err_msg=col)
    for x, y in zip(got["qmeans"], closed["qmeans"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(got["qweights"], closed["qweights"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # the emitted digests feed the batch evaluation surface unchanged
    p = digest_quantiles(
        spark.sql("SELECT * FROM q_stream_t"), [0.5, 0.95]
    ).toPandas()
    assert p["p50"].notna().all() and (p["p95"] >= p["p50"]).all()


def test_out_of_order_rows_skipped(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src_ooo"
    src.mkdir()
    b0 = pd.DataFrame(
        {"series_key": "k", "t": [0.0, 30.0], "value": [1.0, 3.0]}
    )
    b1 = pd.DataFrame(
        {"series_key": "k", "t": [10.0, 70.0], "value": [99.0, 4.0]}
    )
    pq.write_table(pa.Table.from_pandas(b0), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        quantile_stream(stream, "1m")
        .writeStream.format("memory")
        .queryName("q_stream_ooo")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(b1), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM q_stream_ooo").toPandas()
    assert len(got) == 1
    assert got.loc[0, "bucket_start"] == 0
    assert got.loc[0, "n"] == 2  # late t=10 (value 99) skipped
    assert got.loc[0, "vmax"] == 3.0
