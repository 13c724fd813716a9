"""URL canonicalization — the operator that defines SERIES IDENTITY for
per-url crawl histories.

The whole engine keys crawl series by url; if
``https://Example.com/a?utm_source=x`` and ``http://example.com:80/a``
land under different keys, one page's history shatters into fragments
too short to correct, roll up, or drift-classify. Canonicalization is
therefore the first projection of every ingest path, and it must be a
pure JVM expression (it runs on 10¹² rows — no Python, no UDF).

The law (each step pinned in tests):

1. trim; scheme and host lowercased,
2. default ports stripped (``:80`` for http, ``:443`` for https),
3. fragment dropped (``#...`` never reaches the server),
4. tracking parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``mc_eid``, ``igshid``, ``ref``, ``ref_src``) —
   the standard click-id/campaign noise,
5. remaining query parameters SORTED (param order is not semantic),
   empty query dropped,
6. trailing slash stripped from non-root paths, empty path → ``/``.

``www.`` stripping is a POLICY (``strip_www=True`` merges
``www.example.com`` with ``example.com``; some sites genuinely serve
different content — default False).

Helpers: ``url_host`` / ``url_path``, and ``url_domain`` — the
last-two-labels registrable-domain heuristic, with the documented
limitation that multi-label public suffixes (``*.co.uk``) need a
public-suffix list the sandbox doesn't carry; pass ``extra_suffixes``
for the site lists that matter to the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_host", "url_path", "url_domain"]

TRACKING_PARAMS = (
    "utm_[a-z]+",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
)

_SPLIT = r"^(?:([a-zA-Z][a-zA-Z0-9+.-]*):\/\/)?([^\/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _part(url: Column, idx: int) -> Column:
    return F.regexp_extract(F.trim(url), _SPLIT, idx)


def url_host(url_col: str | Column) -> Column:
    """Lowercased host, port and credentials stripped."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    auth = F.lower(_part(url, 2))
    no_cred = F.element_at(F.split(auth, "@"), -1)
    return F.regexp_replace(no_cred, r":\d+$", "")


def url_path(url_col: str | Column) -> Column:
    """Path with the trailing slash stripped (root stays ``/``)."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    p = _part(url, 3)
    p = F.when(p == "", F.lit("/")).otherwise(p)
    return F.when(
        (F.length(p) > 1) & p.endswith("/"), p.substr(F.lit(1), F.length(p) - 1)
    ).otherwise(p)


def url_domain(
    url_col: str | Column, extra_suffixes: Sequence[str] = ()
) -> Column:
    """Registrable domain via the last-two-labels heuristic; hosts ending
    in an ``extra_suffixes`` entry (e.g. ``"co.uk"``) keep three labels."""
    host = url_host(url_col)
    parts = F.split(host, r"\.")
    two = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    three = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    out = F.when(F.size(parts) <= 2, host).otherwise(two)
    for suf in extra_suffixes:
        out = F.when(
            host.endswith("." + suf) & (F.size(parts) >= 3), three
        ).otherwise(out)
    return out


def canonicalize_url(
    url_col: str | Column,
    strip_www: bool = False,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of a URL as one pure-JVM expression (see module
    docstring for the law). NULL/empty input → NULL, and so does any
    input with no parseable host (``?``, ``#``, ``https://`` …) — a
    hostless string cannot key a crawl series. Protocol-relative
    ``//host/path`` resolves to http. Path dot-segments (``/../``) are
    NOT resolved — that is reference resolution, not normalization, and
    collapsing them can change what a server serves."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    # non-hierarchical URIs (mailto:, javascript:, tel:, data: — anything
    # `scheme:` NOT followed by //) are not crawlable pages; without this
    # gate `mailto:user@example.com` would parse as an authority and mint
    # a bogus http://example.com/ key on the mail domain
    non_hier = F.trim(url).rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:(?!//)")
    # protocol-relative: give the authority a scheme so the regex sees it
    url = F.when(
        F.trim(url).startswith("//"), F.concat(F.lit("http:"), F.trim(url))
    ).otherwise(url)
    scheme = F.lower(_part(url, 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    host = url_host(url)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(F.element_at(F.split(F.lower(_part(url, 2)), "@"), -1), r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)

    path = url_path(url)

    # (?i): tracking params arrive in any case (UTM_Source=); values keep
    # their case, only the name match is case-blind
    track_re = "(?i)^(" + "|".join(tracking_params) + ")="
    params = F.filter(
        F.split(_part(url, 4), "&"),
        lambda p: (p != "") & ~p.rlike(track_re),
    )
    query = F.concat_ws("&", F.array_sort(params))
    qpart = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))

    out = F.concat(scheme, F.lit("://"), hostport, path, qpart)
    # a series key needs a real host: dns labels / punycode / IPv4, or a
    # bracketed IPv6 literal — everything else (empty, ':', stray
    # punctuation) returns NULL rather than minting a garbage key
    valid_host = host.rlike(r"^([a-z0-9._%~-]+|\[[0-9a-f:.]+\])$")
    return F.when(
        (F.trim(F.coalesce(url, F.lit(""))) == "") | non_hier | ~valid_host,
        F.lit(None).cast("string"),
    ).otherwise(out)
