"""PII scrubbing — redact contact identifiers from corpus text.

A standard pre-release stage of web-corpus pipelines (e.g. the BigScience
ROOTS and Dolma cleanups): e-mail addresses, phone numbers, and IPv4
addresses are replaced by stable tag tokens so downstream models never
memorize them, while token-count statistics stay roughly intact.

Everything is JVM-side ``regexp_replace``/``regexp_extract_all`` chains —
no Python in the hot path, executes inside the scan's codegen span.  The
patterns deliberately use NO lookarounds or backreferences so they mean
the same thing under Java regex (Spark) and RE2 (DuckDB / external
oracles); that portability is load-bearing for the driver's oracle replay
and is pinned by the ``pii_scrub`` query.

Order matters and is fixed: e-mails first (their local parts may contain
digit runs a phone pattern could chew on), then IPv4 (dotted digit runs
that the phone pattern must never see), then phones.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"
# +CC? then 3-3-4 groups with -, ., or space separators, optional (area)
PHONE_RE = (r"(?:\+[0-9]{1,2}[ -]?)?"
            r"(?:\([0-9]{3}\)[ -]?|[0-9]{3}[-. ])"
            r"[0-9]{3}[-. ][0-9]{4}")

EMAIL_TAG = "<EMAIL>"
IP_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def scrub_pii(col: Column) -> Column:
    """Text column -> text with e-mails, IPv4s, and phone numbers replaced
    by tag tokens, in that fixed order."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TAG)
    out = F.regexp_replace(out, IPV4_RE, IP_TAG)
    return F.regexp_replace(out, PHONE_RE, PHONE_TAG)


def pii_counts(col: Column) -> Column:
    """struct(n_emails, n_ips, n_phones) — match counts per category,
    counted on the SAME intermediate strings the scrub chain produces (so
    a digit run consumed by the IP pass is never double-counted as a
    phone)."""
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TAG)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TAG)
    # idx=0 (whole match): the patterns use only non-capturing groups
    return F.struct(
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), F.lit(0)))
         .alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), F.lit(0)))
         .alias("n_phones"))


def scrub_pii_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs -> same columns with ``text_col`` scrubbed, plus n_emails /
    n_ips / n_phones count columns."""
    counts = pii_counts(F.col(text_col))
    return (docs
            .withColumn("_c", counts)
            .withColumn(text_col, scrub_pii(F.col(text_col)))
            .select(*[c for c in docs.columns],
                    F.col("_c.n_emails").alias("n_emails"),
                    F.col("_c.n_ips").alias("n_ips"),
                    F.col("_c.n_phones").alias("n_phones"))
            .drop("_c"))
