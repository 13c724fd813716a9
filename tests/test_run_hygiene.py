"""jobs/run_hygiene.py: the corpus-hygiene job writes per-crawl filter
signals + per-url volatility and reports one JSON line."""

import json
import os
import subprocess
import sys


def test_run_hygiene_end_to_end(spark, tmp_path):
    # benchmark drawn from the synthetic corpus → guaranteed hits
    from series_correction_project_updated_spark.sources.synth import generate_pages

    bench_path = str(tmp_path / "bench")
    generate_pages(spark, n_urls=5, samples_per_url=2).select("text").limit(
        5
    ).write.parquet(bench_path)

    out = str(tmp_path / "hygiene")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "jobs", "run_hygiene.py"),
            "--synthetic", "40x6", "--out", out,
            "--benchmark", bench_path, "--ngram", "8",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["rows"] > 0
    assert report["urls"] > 0
    assert report["by_change"].get("first") == report["urls"]
    assert report["contaminated"] is not None and report["contaminated"] > 0
    assert os.path.isdir(report["signals_path"])
    assert os.path.isdir(report["url_summary_path"])

    sig = spark.read.parquet(report["signals_path"])
    cols = set(sig.columns)
    # drift + repetition + contamination signals all present per crawl
    assert {"url", "t", "change", "hamming", "line_dup_frac", "top_2gram_frac",
            "n_hits", "contaminated"} <= cols
    assert sig.where("change = 'first'").count() == report["urls"]
    # every crawl got its repetition row (the join key law held)
    assert sig.where("top_2gram_frac IS NULL AND change != 'first'").count() == 0


def test_duplicate_timestamps_do_not_fan_out(spark, tmp_path):
    """Two fetches of the same url at the same warc_ts with different
    bodies: the crawl-identity key includes the text hash, so the signal
    joins stay 1:1 (a (url, ts)-only key would produce 2x2 rows)."""
    import pandas as pd

    pages = pd.DataFrame(
        {
            "url": ["https://a.com/p"] * 2 + ["https://a.com/q"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01T00:00:00", "2024-01-01T00:00:00", "2024-01-02T00:00:00"]
            ),
            "html": [b""] * 3,
            "text": ["body one here", "body two here entirely", "other page"],
            "lang": ["en"] * 3,
        }
    )
    src = str(tmp_path / "pages")
    spark.createDataFrame(pages).write.parquet(src)
    out = str(tmp_path / "hyg")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "jobs", "run_hygiene.py"),
            "--input", src, "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["rows"] == 3  # one signal row per crawl, no fan-out
    sig = spark.read.parquet(report["signals_path"])
    assert sig.count() == 3
    assert sig.where("top_2gram_frac IS NULL").count() == 0
