"""robots.txt parsing and longest-match crawl-permission evaluation.

A compliant crawl pipeline must answer "may agent X fetch URL Y?" for
every candidate URL — at 10^12-URL scale that is a JOIN problem, not a
per-URL library call.  Semantics follow RFC 9309 (the Google rules):

  * rules group under the nearest preceding ``User-agent:`` lines
    (a group may name several agents);
  * the matching rule for a URL path is the LONGEST-path ``Allow`` /
    ``Disallow`` whose path is a prefix of the URL path;
  * ties at equal length resolve to ``Allow``;
  * no matching rule (or an empty-path Disallow) means allowed.

Wildcard ``*``/``$`` patterns are deliberately out of scope (documented;
they need a regex compile per rule — an Arrow-UDF extension point), as
is crawl-delay.  Everything here is line algebra + one prefix join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """Parse robots.txt bodies into (host, agent, rule, path):
    ``rule`` in {'allow', 'disallow'}, ``agent`` lowercased, comments
    ('#' to end of line) stripped, directive names case-insensitive.
    Group structure via two running counts (gaps-and-islands, no fold):
    a User-agent line OPENS a new group when the previous non-blank
    directive line was not itself a User-agent line; rules attach to
    every agent of their group.  Empty-path rules are dropped (RFC:
    an empty Disallow allows everything — i.e. no rule)."""
    lines = (robots.select(F.col(host_col).alias("host"),
                           F.posexplode(F.split(F.col(body_col), r"\r?\n"))
                           .alias("ln", "raw"))
             .withColumn("line", F.trim(F.regexp_replace("raw", r"#.*$", "")))
             .filter(F.col("line") != ""))
    directive = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    d = (lines.select("host", "ln", directive.alias("d"),
                      value.alias("v"))
         .filter(F.col("d").isin("user-agent", "allow", "disallow")))
    w = Window.partitionBy("host").orderBy("ln") \
        .rowsBetween(Window.unboundedPreceding, 0)
    prev_w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("d") == "user-agent").cast("int")
    prev_is_ua = F.coalesce(F.lag(is_ua).over(prev_w), F.lit(0))
    opens = ((is_ua == 1) & (prev_is_ua == 0)).cast("int")
    grouped = d.select("host", "ln", "d", "v",
                       F.sum(opens).over(w).alias("grp"))
    agents = (grouped.filter(F.col("d") == "user-agent")
              .select("host", "grp", F.lower("v").alias("agent"))
              .distinct())
    rules = (grouped.filter(F.col("d") != "user-agent")
             .filter(F.col("v") != "")
             .select("host", "grp", F.col("d").alias("rule"),
                     F.col("v").alias("path")))
    return (agents.join(rules, ["host", "grp"])
            .select("host", "agent", "rule", "path").distinct())


def crawl_permissions(urls: DataFrame, rules: DataFrame,
                      agent: str = "*", url_col: str = "url",
                      host_col: str = "host") -> DataFrame:
    """(url, allowed, matched_path, matched_rule) for every URL under
    RFC 9309 longest-match semantics against the given agent's rule set
    (exactly the ``robots_rules`` output; pass the pre-filtered agent
    slice for a different bot).  URL host/path split with
    ``parse_url``; hosts with no rules — and URLs matching no rule —
    are allowed.

    The rules side is host+path-keyed and robots files are small:
    broadcast it; the per-URL work is one prefix-match join + one
    max_by aggregate (longest path, allow wins ties) — no window over
    the URL table."""
    r = (rules.filter(F.lower(F.col("agent")) == agent.lower())
         .select(F.col("host").alias("_h"), "rule", "path"))
    u = urls.select(F.col(url_col).alias("url"),
                    F.lower(F.parse_url(url_col, F.lit("HOST")))
                    .alias("_h"),
                    F.coalesce(F.parse_url(url_col, F.lit("PATH")),
                               F.lit("/")).alias("_p"))
    j = (u.join(F.broadcast(r), "_h", "left")
         .withColumn("_m", F.col("path").isNotNull()
                     & F.col("_p").startswith(F.col("path"))))
    # pick: longest matched path; allow beats disallow at equal length
    pick = F.struct(F.length("path").alias("l"),
                    (F.col("rule") == "allow").cast("int").alias("a"),
                    F.col("rule"), F.col("path"))
    best = (j.groupBy("url")
            .agg(F.max_by(pick, F.when(F.col("_m"), pick)).alias("_b")))
    matched = F.col("_b").isNotNull()
    return best.select(
        "url",
        F.when(~matched | (F.col("_b.rule") == "allow"), 1).otherwise(0)
        .cast("int").alias("allowed"),
        F.when(matched, F.col("_b.path")).alias("matched_path"),
        F.when(matched, F.col("_b.rule")).alias("matched_rule"))


SITEMAP_URL_PATTERN = r"(?is)<url>(.*?)</url>"
_LOC = r"(?is)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"


def sitemap_entries(sitemaps: DataFrame, host_col: str = "host",
                    body_col: str = "body") -> DataFrame:
    """(host, entry_idx, loc, lastmod) for every <url> entry of a
    sitemap XML body — the crawl-frontier seed list.  lastmod is NULL
    when absent; entries without a <loc> are dropped (an unlocatable
    entry is noise).  Same portable-regex discipline as the robots
    parser and html_table mining; document-order indices."""
    entries = sitemaps.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.regexp_extract_all(
            F.coalesce(F.col(body_col), F.lit("")),
            F.lit(SITEMAP_URL_PATTERN), F.lit(1)))
        .alias("entry_idx", "_e"))
    loc = F.regexp_extract("_e", _LOC, 1)
    lastmod = F.regexp_extract("_e", _LASTMOD, 1)
    return (entries
            .select("host", "entry_idx", loc.alias("loc"),
                    F.when(lastmod != "", lastmod).alias("lastmod"))
            .filter(F.col("loc") != ""))
