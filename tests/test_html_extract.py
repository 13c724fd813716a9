"""html -> text extraction: tag/script/entity handling, determinism
(byte-identity across runs and partitionings — the north-rule per-row
invariant), plain-text passthrough on the synth pages, JVM-only plan."""

import pandas as pd
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.textops import extract_text_from_html
from series_correction_project_updated_spark.sources.synth import generate_pages


def _pages(spark, htmls):
    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(len(htmls))], "html": [h.encode() for h in htmls]}
    )
    return spark.createDataFrame(pdf)


def test_tags_scripts_entities(spark):
    htmls = [
        "<html><body><h1>Title</h1><p>Hello <b>world</b>!</p></body></html>",
        "<p>keep</p><script>var x = '<p>no</p>';</script><p>this</p>",
        "<style type='text/css'>p { color: red }</style>Styled",
        "A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; end",
        "&amp;lt; stays as entity-text",
        "<!-- a comment <p>gone</p> -->visible",
        "   lots\n\nof\t whitespace   ",
    ]
    got = (
        extract_text_from_html(_pages(spark, htmls))
        .orderBy("url")
        .select("text_extracted")
        .toPandas()["text_extracted"]
        .tolist()
    )
    assert got == [
        "Title Hello world !",
        "keep this",
        "Styled",
        'A & B <tag> "q" \'s\' end',
        "&lt; stays as entity-text",
        "visible",
        "lots of whitespace",
    ]


def test_synth_pages_roundtrip_byte_identical(spark):
    """The synthetic pages table stores html = encode(text) with no
    markup, so extraction must reproduce the text column byte-for-byte
    on every row — and stay byte-identical across partitionings."""
    pages = generate_pages(spark, n_urls=30, samples_per_url=40)
    out = extract_text_from_html(pages)
    assert out.where(F.col("text_extracted") != F.col("text")).count() == 0
    h1 = (
        extract_text_from_html(pages.repartition(3))
        .groupBy()
        .agg(F.sum(F.crc32(F.col("text_extracted"))).alias("h"))
        .collect()[0]["h"]
    )
    h2 = (
        extract_text_from_html(pages.repartition(17, "url"))
        .groupBy()
        .agg(F.sum(F.crc32(F.col("text_extracted"))).alias("h"))
        .collect()[0]["h"]
    )
    assert h1 == h2


def test_jvm_only_plan(spark):
    pages = generate_pages(spark, n_urls=3, samples_per_url=5)
    plan = (
        extract_text_from_html(pages)._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
