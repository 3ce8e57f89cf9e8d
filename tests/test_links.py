"""Anchor extraction + alias dictionary: scanner cases, partitioning
invariance, aggregation semantics."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.functions.links import (
    anchor_aliases, extract_links, scan_links)

CASES = [
    # double-quoted, nested tag + entity in anchor
    (b'<p><a href="http://X.com/a#f">Big <b>Fish</b> &amp; Co</a></p>',
     [("http://X.com/a#f", "Big Fish & Co")]),
    # single-quoted and bare hrefs
    (b"<a href='http://x.com/b'>beta</a><a href=http://x.com/c>gamma</a>",
     [("http://x.com/b", "beta"), ("http://x.com/c", "gamma")]),
    # image-only anchor (no visible text) and empty href dropped
    (b'<a href="http://x.com/d"><img src="i.png"/></a><a href="">t</a>',
     []),
    # commented-out and scripted links are not links
    (b'<!-- <a href="http://x.com/e">no</a> --><script>'
     b'var a = \'<a href="http://x.com/f">no</a>\';</script>'
     b'<a href="http://x.com/g">yes</a>',
     [("http://x.com/g", "yes")]),
    # whitespace collapse across newlines, href entity unescape
    (b'<a href="http://x.com/h?a=1&amp;b=2">  two\n  words </a>',
     [("http://x.com/h?a=1&b=2", "two words")]),
    # case-insensitive tag/attr, attrs before href
    (b'<A CLASS="z" HREF="http://x.com/i">Up</A>',
     [("http://x.com/i", "Up")]),
]


def test_scan_links_cases():
    for raw, expected in CASES:
        assert scan_links(raw) == expected, raw


@pytest.fixture(scope="module")
def pages_df(spark):
    rows = []
    # p0/p1 both link t1 with alias "Alpha Beta"; p1 links it twice; p1
    # links t2 once with tracking params that canonicalization strips
    p0 = (b'<a href="HTTP://EX.com/t1">Alpha  Beta</a>')
    p1 = (b'<a href="http://ex.com/t1#x">alpha beta</a>'
          b'<a href="http://ex.com/t1">ALPHA BETA</a>'
          b'<a href="http://ex.com/t2?utm_source=m&q=1">Gamma</a>')
    rows.append(("http://p0", bytearray(p0)))
    rows.append(("http://p1", bytearray(p1)))
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_and_aggregate(spark, pages_df):
    links = extract_links(pages_df)
    got = {(r["page_url"], r["href"], r["anchor"])
           for r in links.collect()}
    assert ("http://p0", "HTTP://EX.com/t1", "Alpha  Beta") not in got
    assert ("http://p0", "HTTP://EX.com/t1", "Alpha Beta") in got
    assert len(got) == 4

    alias = {(r["target"], r["alias"]): (r["n_links"], r["n_pages"])
             for r in anchor_aliases(links).collect()}
    # canonicalization folds host case and fragments; alias folds case
    assert alias[("http://ex.com/t1", "alpha beta")] == (3, 2)
    assert alias[("http://ex.com/t2?q=1", "gamma")] == (1, 1)

    strict = anchor_aliases(links, min_pages=2).collect()
    assert {(r["target"], r["alias"]) for r in strict} == {
        ("http://ex.com/t1", "alpha beta")}


def test_partitioning_invariance(spark, pages_df):
    one = sorted(map(tuple, extract_links(pages_df.coalesce(1)).collect()))
    many = sorted(map(tuple,
                      extract_links(pages_df.repartition(7)).collect()))
    assert one == many


def test_top_k_per_target(spark):
    rows = [("http://p", f'<a href="http://t">{a}</a>'.encode())
            for a in ["x", "x", "x", "y", "y", "z"]]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary")
    top2 = anchor_aliases(extract_links(df), top_k=2).collect()
    assert [(r["alias"], r["n_links"]) for r in
            sorted(top2, key=lambda r: -r["n_links"])] == [("x", 3),
                                                           ("y", 2)]


def test_alias_commonness(spark):
    from climatemind_ontology_processing_spark.functions.links import (
        alias_commonness)
    aliases = spark.createDataFrame(
        [("t1", "a", 3, 2), ("t2", "a", 1, 1), ("t1", "b", 2, 2)],
        "target string, alias string, n_links long, n_pages long")
    got = {(r["alias"], r["target"]): (r["commonness_micro"], r["rank"])
           for r in alias_commonness(aliases).collect()}
    assert got == {("a", "t1"): (750000, 1), ("a", "t2"): (250000, 2),
                   ("b", "t1"): (1000000, 1)}
