"""Streaming top-k tier: closed buckets bit-equal the batch rollup
(summary order, bounds, err, n), late-bucket skip policy."""

import numpy as np
import pandas as pd

from series_correction_project_updated_spark.operators.topk import topk_rollup
from series_correction_project_updated_spark.streaming.topk_stream import topk_stream


def _events_pdf(seed=41, n=3000, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    # Zipf-ish item popularity so summaries actually truncate at m
    items = np.array([f"e{i:02d}" for i in range(40)])
    frames = []
    for k in keys:
        p = 1.0 / np.arange(1, len(items) + 1)
        p /= p.sum()
        frames.append(
            pd.DataFrame(
                {
                    "series_key": k,
                    "ts": 1.7e9 + np.sort(rng.uniform(0, 4 * 3600, n)),
                    "event_type": rng.choice(items, n, p=p),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _norm(df):
    df = df.sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    df["items"] = df["items"].map(
        lambda arr: [(x["item"], x["lo"], x["hi"]) for x in arr]
    )
    return df


def test_closed_buckets_bit_equal_batch(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = _events_pdf()
    src = tmp_path / "src_topk"
    src.mkdir()
    cut = len(pdf) // 2
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:cut]), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        topk_stream(stream, "1h", m=10, key_col="series_key")
        .writeStream.format("memory")
        .queryName("topk_stream_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[cut:]), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = _norm(spark.sql("SELECT * FROM topk_stream_t").toPandas())
    batch = _norm(
        topk_rollup(
            spark.createDataFrame(pdf), "1h", m=10, key_col="series_key"
        ).toPandas()
    )
    open_b = batch.groupby("series_key")["bucket_start"].max()
    closed = batch[
        batch["bucket_start"] != batch["series_key"].map(open_b)
    ].reset_index(drop=True)
    assert len(got) == len(closed) >= 6
    assert any(r["err"] > 0 for _, r in got.iterrows())  # truncation exercised
    for col in got.columns:
        assert got[col].tolist() == closed[col].tolist(), col


def test_late_bucket_skipped_open_bucket_ooo_ok(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src_topk_ooo"
    src.mkdir()
    b0 = pd.DataFrame(
        {"ts": [0.0, 10.0, 3700.0], "event_type": ["x", "y", "x"]}
    )
    # ts=20 targets the CLOSED bucket 0 (skipped); ts=3600.5 is
    # out-of-order but inside the OPEN bucket (counted); ts=7300 closes it
    b1 = pd.DataFrame(
        {"ts": [20.0, 3600.5, 7300.0], "event_type": ["x", "y", "z"]}
    )
    pq.write_table(pa.Table.from_pandas(b0), str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        topk_stream(stream, "1h", m=5)
        .writeStream.format("memory")
        .queryName("topk_stream_ooo")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    pq.write_table(pa.Table.from_pandas(b1), str(src / "b1.parquet"))
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM topk_stream_ooo").toPandas()
    got = got.sort_values("bucket_start").reset_index(drop=True)
    assert got["bucket_start"].tolist() == [0, 3600]
    # bucket 0: x,y one each (late x at ts=20 skipped); ties: item desc
    assert [(i["item"], i["lo"], i["hi"]) for i in got.loc[0, "items"]] == [
        ("y", 1.0, 1.0),
        ("x", 1.0, 1.0),
    ]
    assert got.loc[0, "n"] == 2
    # bucket 3600: x at 3700 plus out-of-order y at 3600.5 — both counted
    assert sorted(i["item"] for i in got.loc[1, "items"]) == ["x", "y"]
    assert got.loc[1, "n"] == 2
