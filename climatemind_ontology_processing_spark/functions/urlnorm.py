"""URL canonicalization — the identity function of a web-crawl pipeline.

Two fetches of one resource routinely differ in the URL string (scheme case,
default ports, fragments, tracking params, trailing slashes); URL-keyed
dedup, lineage bucketing (``plans/lineage.with_bucket``), and per-url
invariants (input_hint: "byte-identical extracted text per url") all assume
one canonical spelling.  Everything here is JVM-side column expressions
(regexp_replace / parse_url / lower) — no Python in the hot path, executes
inside the scan's whole-stage-codegen span.

Normalizations (the conservative, semantics-preserving subset of RFC 3986
§6 plus the de-facto tracking-param strip):

1. lowercase scheme + host;
2. drop the fragment (``#...`` — never sent to the server);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. strip tracking query params (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``ref``), preserving the ORDER of the survivors (full
   param re-sorting changes semantics on some servers — deliberately not
   done);
5. drop a now-empty query's dangling ``?``;
6. collapse a bare-host empty path to ``/`` (http://x.com == http://x.com/).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|ref)"


def canonical_url(url: Column) -> Column:
    """Canonical spelling of an absolute http(s) URL (column expression)."""
    u = F.trim(url)
    # 1. lowercase scheme://host[:port]  (leave path/query case alone)
    scheme_host = F.lower(F.regexp_extract(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme_host, rest)
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. default ports (capture form, no lookahead — RE2-compatible so an
    # external oracle can mirror the pattern verbatim)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443([/?#].*)?$", r"$1$2")
    # 4. tracking params: ONE pattern consumes an entire run of adjacent
    # tracked params (a fixed number of alternating passes leaves residue
    # past ~8 adjacent params — round-3 ADVICE, low), then the trailing
    # form handles the last param (no '&' after it)
    u = F.regexp_replace(u, r"([?&])(?:" + _TRACKING + r"=[^&#]*&)+", r"$1")
    u = F.regexp_replace(u, r"[?&]" + _TRACKING + r"=[^&#]*$", "")
    u = F.regexp_replace(u, r"\?&", "?")
    # 5. dangling '?'
    u = F.regexp_replace(u, r"\?$", "")
    # 6. bare host -> trailing slash
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)$", r"$1/")
    return u


def with_canonical_url(df, url_col: str = "url",
                       out_col: str = "canonical_url"):
    """pages -> pages + canonical_url column."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup_key(url: Column) -> Column:
    """(canonical_url) -> 64-bit key for URL-level dedup / bucketing."""
    return F.xxhash64(canonical_url(url))
