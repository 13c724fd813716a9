"""content_drift_stream: live crawl change classification — equal to the
batch operator on an ordered stream (incl. across micro-batch splits),
late rows flagged without perturbing state."""

import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.drift import content_drift
from series_correction_project_updated_spark.streaming.drift_stream import (
    content_drift_stream,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
REWRITE = "completely different page now selling discount furniture and garden tools online"


def _crawls():
    rows = []
    for u in range(6):
        texts = [
            BASE + f" page{u}",
            BASE + f" page{u}",                       # unchanged
            "  " + (BASE + f" page{u}").replace(" ", "   "),  # cosmetic
            REWRITE + f" page{u}",                     # rewrite
        ]
        for i, txt in enumerate(texts):
            rows.append((f"u{u}", float(1_700_000_000 + 86400 * i), txt))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "text"])


def _run_stream(spark, tmp_path, pdf, files):
    src = str(tmp_path / "src")
    # split rows across `files` parquet files → one micro-batch each
    per = (len(pdf) + files - 1) // files
    for i in range(files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"drift_stream_{files}"
    q = (
        content_drift_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return (
        spark.sql(f"SELECT * FROM {name}")
        .toPandas()
        .sort_values(["url", "t"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("files", [1, 4])
def test_stream_matches_batch(spark, tmp_path, files):
    """Ordered delivery (each url's crawls ascend across batches) →
    identical classification to the batch operator, any batch split."""
    pdf = _crawls().sort_values("warc_ts", kind="mergesort").reset_index(drop=True)
    got = _run_stream(spark, tmp_path, pdf, files)

    batch_df = spark.createDataFrame(_crawls())
    want = (
        content_drift(batch_df)
        .toPandas()
        .sort_values(["url", "t"])
        .reset_index(drop=True)
    )
    assert list(got["url"]) == list(want["url"])
    assert list(got["t"]) == list(want["t"])
    assert list(got["change"]) == list(want["change"])
    assert list(got["simhash"]) == list(want["simhash"])
    assert got["hamming"].astype("Float64").equals(want["hamming"].astype("Float64"))


def test_late_rows_flagged_not_stateful(spark, tmp_path):
    """A crawl arriving in a later batch with an older timestamp emits
    change='late' and leaves the frontier state untouched."""
    t0 = 1_700_000_000.0
    b1 = pd.DataFrame(
        [("u", t0, BASE), ("u", t0 + 86400, REWRITE)],
        columns=["url", "warc_ts", "text"],
    )
    b2 = pd.DataFrame(
        [("u", t0 + 43200, "something in between entirely"),  # late
         ("u", t0 + 2 * 86400, REWRITE)],                      # in order
        columns=["url", "warc_ts", "text"],
    )
    pdf = pd.concat([b1, b2], ignore_index=True)
    got = _run_stream(spark, tmp_path, pdf, 2)
    by_t = {r.t: r.change for r in got.itertuples()}
    assert by_t[t0] == "first"
    assert by_t[t0 + 86400] == "rewrite"
    assert by_t[t0 + 43200] == "late"
    # the in-order row after the late one classifies against the
    # frontier (identical text to the stored rewrite) → unchanged
    assert by_t[t0 + 2 * 86400] == "unchanged"
