"""Domain-level corpus statistics — the head-domain skew lens.

Web corpora are Zipfian in hostname: a handful of head domains contribute
orders of magnitude more pages than the tail, which is exactly the skew
the engine's salting/bucket-cap guardrails exist for (BASELINE north
rule: "salted repartitioning handles head-domain skew").  This module
computes the distribution those decisions are made from:

* ``domain_of`` — hostname extraction as a pure column expression
  (scheme/userinfo/port stripped, lowercased) plus a registrable-domain
  approximation (last two labels, with a small built-in second-level
  suffix list for ``co.uk``-style domains — a documented approximation of
  the Public Suffix List, not a copy of it).
* ``domain_stats`` — (domain, n_docs, share_micro, rank): doc counts,
  corpus share in exact micro-BIGINTs, densest-first rank.  One map-side
  combinable groupBy (counts never skew a shuffle the way row payloads
  do) + one 1-row total crossJoin + one rank window over the (small)
  domain table.

Scale note: the groupBy shuffles (domain, partial_count) pairs only; the
window runs over distinct domains, orders of magnitude smaller than the
corpus.  ``top_k`` truncates the output AFTER ranking (share/rank are
computed over the full distribution).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# common second-level public suffixes (approximation; the full PSL is a
# moving external dataset — callers with exact needs pass their own list)
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.za", "com.ar", "com.tr", "com.sg",
)


def host_of(url: Column) -> Column:
    """Lowercased hostname of an absolute URL: scheme, userinfo, port,
    path, query, fragment stripped.  Pure regexp — codegen-friendly."""
    return F.lower(F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))


def domain_of(url: Column,
              second_level: tuple[str, ...] = SECOND_LEVEL_SUFFIXES
              ) -> Column:
    """Registrable-domain approximation: the last TWO labels of the host,
    or the last THREE when the two-label tail is a known second-level
    suffix (``bbc.co.uk`` -> ``bbc.co.uk``, not ``co.uk``)."""
    host = host_of(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.when(n >= 2, F.concat_ws(".", F.element_at(parts, -2),
                                     F.element_at(parts, -1))).otherwise(host)
    three = F.when(n >= 3, F.concat_ws(".", F.element_at(parts, -3),
                                       F.element_at(parts, -2),
                                       F.element_at(parts, -1)))
    is_sl = two.isin(*second_level)
    return F.when(is_sl & three.isNotNull(), three).otherwise(two)


def domain_stats(pages: DataFrame, url_col: str = "url",
                 top_k: int | None = None,
                 registrable: bool = True) -> DataFrame:
    """(domain, n_docs, share_micro, rank) over the corpus, densest first.

    ``share_micro`` = round(n_docs / total * 1e6) as BIGINT — exact across
    engines (CLAUDE.md micro-BIGINT convention).  ``rank`` breaks count
    ties by domain name ascending (deterministic)."""
    dom = (domain_of(F.col(url_col)) if registrable
           else host_of(F.col(url_col)))
    counts = (pages.select(dom.alias("domain"))
              .filter(F.length("domain") > 0)
              .groupBy("domain").agg(F.count("*").alias("n_docs")))
    total = counts.agg(F.sum("n_docs").alias("_total"))
    w = Window.orderBy(F.col("n_docs").desc(), F.col("domain").asc())
    out = (counts.crossJoin(F.broadcast(total))
           .select("domain", "n_docs",
                   F.round(F.col("n_docs") / F.col("_total") * 1e6)
                    .cast("long").alias("share_micro"))
           .withColumn("rank", F.row_number().over(w)))
    return out.filter(F.col("rank") <= top_k) if top_k else out


def domain_cap_sample(pages: DataFrame, url_col: str = "url",
                      max_per_domain: int = 100,
                      key: str | None = None, seed: int = 42,
                      hash_family: str = "xxhash64",
                      registrable: bool = True) -> DataFrame:
    """Per-domain quota sampling — cap any domain's contribution to the
    corpus at ``max_per_domain`` pages, selected deterministically (the
    standard head-domain flattening step of crawl curation: without it one
    parked-domain farm is a double-digit share of the corpus).

    Selection is ``sampling.stratified_take_k``'s pure-hash rank of
    ``key`` (default: the url), so membership is partition-invariant,
    retry-stable, and a smaller cap selects a prefix of a larger one.

    SKEW SHAPE: the exact-k rank needs a per-domain window sort, but ONLY
    over-cap domains pay it — a keys-only domain census splits the corpus
    into under-cap domains (pass untouched, semi-join) and over-cap
    domains (anti-join -> ranked).  On web data that is a handful of head
    domains; the 99%+ long tail never enters a window.
    """
    from .sampling import stratified_take_k
    key = key or url_col
    dom = (domain_of(F.col(url_col)) if registrable
           else host_of(F.col(url_col)))
    tagged = pages.withColumn("_dom", dom)
    small = (tagged.groupBy("_dom").agg(F.count("*").alias("_n"))
             .filter(F.col("_n") <= max_per_domain).select("_dom"))
    pass_through = tagged.join(small, "_dom", "left_semi")
    capped = stratified_take_k(
        tagged.join(small, "_dom", "left_anti"), "_dom",
        max_per_domain, key, seed=seed, hash_family=hash_family)
    return pass_through.unionByName(capped).drop("_dom")
