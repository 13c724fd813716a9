"""canonicalize_url / url_host / url_domain: the series-identity law —
planted variants collapse, Python urllib replay, plan purity."""

import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.urls import (
    canonicalize_url,
    url_domain,
    url_host,
    url_path,
)


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonicalize_url("url", **kw).alias("c")).collect()]


def test_variants_collapse(spark):
    variants = [
        "https://Example.com/a?utm_source=x&utm_campaign=y",
        "https://example.com:443/a",
        "https://example.com/a/",
        "https://example.com/a#section-2",
        "https://example.com/a?fbclid=abc123",
        "  https://example.com/a  ",
    ]
    got = set(_canon(spark, variants))
    assert got == {"https://example.com/a"}


def test_each_rule(spark):
    cases = {
        # scheme/host lowercase, path case PRESERVED
        "HTTP://WWW.Site.COM/Path": "http://www.site.com/Path",
        # default port by scheme; non-default kept
        "http://a.com:80/x": "http://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:80/x": "https://a.com:80/x",
        # query params sorted, tracking dropped, empty query dropped
        "https://a.com/p?b=2&a=1": "https://a.com/p?a=1&b=2",
        "https://a.com/p?utm_medium=m&gclid=g": "https://a.com/p",
        # ref is tracking; real params survive
        "https://a.com/p?ref=tw&id=7": "https://a.com/p?id=7",
        # root path normalization
        "https://a.com": "https://a.com/",
        "https://a.com/": "https://a.com/",
        # scheme-less input defaults to http
        "a.com/x": "http://a.com/x",
        # credentials stripped from host
        "https://user:pw@a.com/x": "https://a.com/x",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_null_and_www_policy(spark):
    df = spark.createDataFrame([(None,), ("",), ("https://www.a.com/x",)], "url string")
    out = df.select(
        canonicalize_url("url").alias("keep"),
        canonicalize_url("url", strip_www=True).alias("strip"),
    ).collect()
    assert out[0]["keep"] is None and out[1]["keep"] is None
    assert out[2]["keep"] == "https://www.a.com/x"
    assert out[2]["strip"] == "https://a.com/x"


def test_idempotent(spark):
    urls = [
        "https://Example.com/a?utm_source=x&b=2&a=1#f",
        "http://u:p@Host.com:80/deep/path/?ref=x",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_matches_urllib_replay(spark):
    """Host/path parsing agrees with Python's urlsplit on well-formed urls."""
    from urllib.parse import urlsplit

    urls = [
        "https://A.com/x/y?q=1",
        "http://b.org:8080/",
        "https://user@c.net/p/",
        "ftp://d.io/file.txt",
        "https://e.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        url_host("url").alias("h"), url_path("url").alias("p")
    ).collect()
    for u, r in zip(urls, got):
        s = urlsplit(u)
        assert r["h"] == s.hostname, u
        want_path = s.path or "/"
        if len(want_path) > 1 and want_path.endswith("/"):
            want_path = want_path[:-1]
        assert r["p"] == want_path, u


def test_domain_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("https://news.site.example.com/a",),
            ("https://example.com/a",),
            ("https://localhost/x",),
            ("https://shop.example.co.uk/y",),
        ],
        "url string",
    )
    plain = [r["d"] for r in df.select(url_domain("url").alias("d")).collect()]
    assert plain[:3] == ["example.com", "example.com", "localhost"]
    assert plain[3] == "co.uk"  # the documented two-label limitation...
    with_psl = [
        r["d"]
        for r in df.select(
            url_domain("url", extra_suffixes=["co.uk"]).alias("d")
        ).collect()
    ]
    assert with_psl[3] == "example.co.uk"  # ...lifted by extra_suffixes


def test_plan_pure_jvm(spark):
    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = (
        df.select(canonicalize_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_drift_composes_over_canonical_urls(spark):
    """Canonicalization merges a shattered crawl history: the same page
    crawled under tracking-param variants becomes ONE drift series."""
    from series_correction_project_updated_spark.operators.drift import content_drift

    rows = [
        ("https://a.com/p?utm_source=x", "2024-01-01 00:00:00", "text one"),
        ("https://a.com/p", "2024-01-02 00:00:00", "text one"),
        ("https://A.com/p/#frag", "2024-01-03 00:00:00", "rewritten totally new"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string, text string")
    pages = pages.select(
        canonicalize_url("url").alias("url"),
        F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        "text",
    )
    out = content_drift(pages).orderBy("t").collect()
    assert [r["change"] for r in out] == ["first", "unchanged", "rewrite"]


def test_degenerate_inputs(spark):
    """Hostless strings can't key a crawl series → NULL, never a
    garbage 'http:///' key; protocol-relative urls resolve to http."""
    cases = {
        "https://": None,
        "?": None,
        "#": None,
        ":": None,
        "https://?x=1": None,
        "http:///path": None,
        "//host/path": "http://host/path",
        "https://h#": "https://h/",
        "https://h?": "https://h/",
        "https://h/p?&&a=1&": "https://h/p?a=1",
        # dot-segments preserved (reference resolution is out of scope)
        "HTTPS://H/../a/./b": "https://h/../a/./b",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_tracking_params_case_blind(spark):
    got = _canon(spark, ["https://a.com/p?UTM_Source=x&Gclid=1&id=7"])
    assert got == ["https://a.com/p?id=7"]


def test_non_hierarchical_schemes_null(spark):
    """mailto:/javascript:/tel:/data: hrefs are not crawlable pages and
    must not mint keys on the mail domain."""
    got = _canon(
        spark,
        ["mailto:user@example.com", "javascript:void(0)", "tel:+15551234567",
         "data:text/plain;base64,aGk=", "https://example.com/ok"],
    )
    assert got == [None, None, None, None, "https://example.com/ok"]
