"""Deterministic synthetic Common-Crawl-style pages table.

Shape per BASELINE.json ``input_hint``: (url, warc_ts, html, text, lang).
Per-url crawl histories form the time series (FIXTURES.md §1). Generation is
100% columnar (``spark.range`` + ``xxhash64``-seeded pseudo-randomness) — no
driver loops, no Python UDFs — so the SAME code generates 10^3 rows for tests
and 10^12 rows on a cluster, and every row is a pure function of
``(url_id, sample_idx, seed)`` regardless of partitioning.

Injected discontinuities (motifs of the reference's test vectors,
FIXTURES.md §1):
- jumps: a persistent +Δ level shift from a per-url position onward,
- gaps: k consecutive samples deleted at a per-url position,
- outliers: isolated ×30 spikes at ~0.5% of positions,
- hot-domain skew: domain 0 owns ~30% of urls (skew-handling check),
  and url 0 is a "hot series" with ``hot_factor`` × the samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1_577_836_800  # 2020-01-01T00:00:00Z
LANGS = ["en", "de", "fr", "es", "zh"]


def _u01(*cols) -> F.Column:
    """Deterministic uniform[0,1) from hashed columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)).cast("double")) / 1_000_000.0


def generate_pages(
    spark: SparkSession,
    n_urls: int = 100,
    samples_per_url: int = 200,
    interval_sec: int = 3600,
    seed: int = 42,
    hot_factor: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Build the pages DataFrame. Deterministic in (args, seed)."""
    total = n_urls * samples_per_url
    rows = spark.range(0, total, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    rows = rows.select(
        (F.col("id") % n_urls).alias("url_id"),
        (F.col("id") / n_urls).cast("long").alias("i"),
    )
    # hot series: url 0 gets hot_factor× density (extra samples interleaved)
    if hot_factor > 1:
        extra = spark.range(0, samples_per_url * (hot_factor - 1)).select(
            F.lit(0).cast("long").alias("url_id"),
            (F.col("id") + samples_per_url).cast("long").alias("i"),
        )
        rows = rows.unionByName(extra)

    s = F.lit(seed)
    r_out = _u01(F.col("url_id"), F.col("i"), s, F.lit("outlier"))
    r_jump_pos = F.pmod(F.xxhash64(F.col("url_id"), s, F.lit("jpos")), F.lit(samples_per_url // 2)) + samples_per_url // 4
    jump_amt = (_u01(F.col("url_id"), s, F.lit("jamt")) * 8.0 + 2.0) * F.when(
        _u01(F.col("url_id"), s, F.lit("jsign")) < 0.5, -1.0
    ).otherwise(1.0)
    has_jump = _u01(F.col("url_id"), s, F.lit("hasj")) < 0.5
    gap_pos = F.pmod(F.xxhash64(F.col("url_id"), s, F.lit("gpos")), F.lit(samples_per_url // 2)) + samples_per_url // 4
    gap_len = F.pmod(F.xxhash64(F.col("url_id"), s, F.lit("glen")), F.lit(5)) + 2
    has_gap = _u01(F.col("url_id"), s, F.lit("hasg")) < 0.5

    base = 5.0 + _u01(F.col("url_id"), s, F.lit("base")) * 3.0
    noise = (_u01(F.col("url_id"), F.col("i"), s, F.lit("n")) - 0.5) * 0.4
    seasonal = F.sin(F.col("i").cast("double") / 7.0) * 0.3
    value = base + seasonal + noise
    value = value + F.when(has_jump & (F.col("i") >= r_jump_pos), jump_amt).otherwise(0.0)
    value = F.when(r_out < 0.005, value * 30.0).otherwise(value)

    # gaps: delete k consecutive samples (never the hot-series extras)
    in_gap = has_gap & (F.col("i") >= gap_pos) & (F.col("i") < gap_pos + gap_len) & (F.col("i") < samples_per_url)
    rows = rows.where(~in_gap)

    # hot-domain skew: domain 0 owns ~30% of urls
    domain = F.when(F.pmod(F.col("url_id"), F.lit(10)) < 3, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("url_id"), s, F.lit("dom")), F.lit(47)) + 1
    )
    url = F.format_string("https://d%04d.example/p%05d", domain.cast("int"), F.col("url_id").cast("int"))
    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH)
        + F.col("i") * F.lit(interval_sec) / F.when(F.col("url_id") == 0, hot_factor).otherwise(1)
    )
    # text is a pure function of url -> byte-identical per url by construction
    text = F.format_string(
        "page body for url %s lang token payload %d", url, F.pmod(F.xxhash64(url, s), F.lit(1000))
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64(F.col("url_id"), s, F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int"),
    )
    return rows.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.encode(text, "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        value.alias("signal"),
    )


def pages_to_series(pages: DataFrame) -> DataFrame:
    """pages → long series points (series_key, t, value).

    The numeric signal column, keyed by url, ordered by crawl time. Column
    pruning matters here: this must never materialize ``html`` (checked by
    tests via the optimized plan). The ``signal`` column is used when present
    (synthetic tables); otherwise the signal is ``length(text)`` — a cheap,
    deterministic page-derived series.
    """
    cols = set(pages.columns)
    value = F.col("signal") if "signal" in cols else F.length("text").cast("double")
    return pages.select(
        F.col("url").alias("series_key"),
        F.col("warc_ts").cast("double").alias("t"),
        value.alias("value"),
    )
