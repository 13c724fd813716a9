"""state_rollup_stream: emitted pieces sum to the batch tier exactly on
an ordered stream, across micro-batch splits; late rows dropped."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.stateagg import state_rollup
from series_correction_project_updated_spark.streaming.stateagg_stream import (
    state_rollup_stream,
)


def _states_pdf(seed=5, n_series=4, n=120):
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_series):
        t = np.cumsum(rng.integers(7, 200, n)).astype("float64")
        st = rng.choice(["up", "down", "flaky"], n)
        rows += [(f"s{k}", float(ti), si) for ti, si in zip(t, st)]
    return pd.DataFrame(rows, columns=["series_key", "t", "state"])


def _run(spark, tmp_path, pdf, files, name, **kw):
    src = str(tmp_path / "src")
    chunks = (
        pdf
        if isinstance(pdf, list)
        else [
            pdf.iloc[i * ((len(pdf) + files - 1) // files) : (i + 1) * ((len(pdf) + files - 1) // files)]
            for i in range(files)
        ]
    )
    for chunk in chunks:
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        state_rollup_stream(stream, "1m", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("files", [1, 3])
def test_pieces_sum_to_batch_tier(spark, tmp_path, files):
    pdf = _states_pdf().sort_values("t", kind="mergesort").reset_index(drop=True)
    got = (
        _run(spark, tmp_path, pdf, files, f"state_stream_{files}")
        .groupBy("series_key", "bucket_start", "state")
        .agg(F.sum("duration_sec").alias("duration_sec"))
        .toPandas()
    )
    want = state_rollup(spark.createDataFrame(pdf), "1m").toPandas()
    key = ["series_key", "bucket_start", "state"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got[key] == want[key]).all().all()
    np.testing.assert_allclose(got["duration_sec"], want["duration_sec"], rtol=1e-12)


def test_late_rows_dropped_and_gap_gate(spark, tmp_path):
    b1 = pd.DataFrame(
        [("k", 0.0, "up"), ("k", 120.0, "down")],
        columns=["series_key", "t", "state"],
    )
    b2 = pd.DataFrame(
        [("k", 60.0, "flaky"),        # late: frontier is 120 → dropped
         ("k", 100_000.0, "up"),      # closes a 99880s dark segment → gated
         ("k", 100_060.0, "down")],   # closes a normal 60s 'up' segment
        columns=["series_key", "t", "state"],
    )
    got = (
        _run(
            spark, tmp_path, [b1, b2], 2,
            "state_stream_late", max_gap_sec=3600.0,
        )
        .toPandas()
        .sort_values(["bucket_start"])
    )
    # emitted: [0,120) up (two 1m pieces) + [100000,100060) up; nothing flaky
    assert set(got["state"]) == {"up"}
    assert got["duration_sec"].sum() == pytest.approx(180.0)
