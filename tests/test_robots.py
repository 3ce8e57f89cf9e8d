"""robots.txt parsing + RFC 9309 longest-match permission evaluation."""
from __future__ import annotations

from climatemind_ontology_processing_spark.operators.robots import (
    crawl_permissions, robots_rules)

BODY = """# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow:

User-agent: googlebot
User-agent: examplebot
Disallow: /
Allow: /public
"""


def test_robots_rules_groups_and_multi_agent(spark):
    df = spark.createDataFrame([("example.com", BODY)],
                               "host string, body string")
    got = {(r.agent, r.rule, r.path) for r in robots_rules(df).collect()}
    assert got == {
        ("*", "disallow", "/private/"),
        ("*", "allow", "/private/ok"),
        ("googlebot", "disallow", "/"),
        ("googlebot", "allow", "/public"),
        ("examplebot", "disallow", "/"),
        ("examplebot", "allow", "/public"),
    }


def test_crawl_permissions_longest_match_and_ties(spark):
    robots = spark.createDataFrame([("example.com", BODY)],
                                   "host string, body string")
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [("http://example.com/private/page",),     # disallowed
         ("http://example.com/private/ok/x",),     # longer Allow wins
         ("http://example.com/open",),             # no rule -> allowed
         ("http://other.com/anything",)],          # no robots -> allowed
        "url string")
    got = {r.url: (r.allowed, r.matched_path, r.matched_rule)
           for r in crawl_permissions(urls, rules, agent="*").collect()}
    assert got["http://example.com/private/page"] == \
        (0, "/private/", "disallow")
    assert got["http://example.com/private/ok/x"] == \
        (1, "/private/ok", "allow")
    assert got["http://example.com/open"] == (1, None, None)
    assert got["http://other.com/anything"] == (1, None, None)


def test_crawl_permissions_specific_agent_and_tie_allow_wins(spark):
    robots = spark.createDataFrame(
        [("h.com", "User-agent: bot\nAllow: /a\nDisallow: /a\n")],
        "host string, body string")
    rules = robots_rules(robots)
    urls = spark.createDataFrame([("http://h.com/a/x",)], "url string")
    got = crawl_permissions(urls, rules, agent="BOT").collect()[0]
    assert (got.allowed, got.matched_rule) == (1, "allow")


def test_sitemap_entries(spark):
    from climatemind_ontology_processing_spark.operators.robots import (
        sitemap_entries)
    body = ("<urlset><url><loc> http://h.com/a </loc>"
            "<lastmod>2024-01-01</lastmod></url>"
            "<url><loc>http://h.com/b</loc></url>"
            "<url><lastmod>2024-02-02</lastmod></url></urlset>")
    df = spark.createDataFrame([("h.com", body), ("x.com", None)],
                               "host string, body string")
    got = {(r.host, r.entry_idx): (r.loc, r.lastmod)
           for r in sitemap_entries(df).collect()}
    assert got == {("h.com", 0): ("http://h.com/a", "2024-01-01"),
                   ("h.com", 1): ("http://h.com/b", None)}
