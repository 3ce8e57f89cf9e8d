"""HTML -> text extraction, Arrow-vectorized and byte-deterministic.

The reference never parses HTML (its input is a curated OWL file); this stage
is the web-scale front half the graft adds (BASELINE.json ``north_star``).  The
hard requirement (``input_hint``) is **byte-identical extracted text per url**
across runs and partitionings — so the extractor is a frozen, pure-Python,
regex-based transform with an explicit charset-decode chain, applied through
``mapInPandas`` (no per-row Python UDF surface).

Decode chain: declared ``<meta charset=...>`` if recognized -> utf-8 strict ->
latin-1 (never fails).  Extraction: drop <script>/<style> subtrees, block-level
tags emit newlines, other tags are stripped, entities are unescaped, horizontal
whitespace is collapsed, blank lines removed.
"""
from __future__ import annotations

import html as html_mod
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHARSET_RE = re.compile(rb'charset\s*=\s*["\']?([A-Za-z0-9_\-]+)', re.IGNORECASE)
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_HEAD_RE = re.compile(r"<head\b[^>]*>(.*?)</head\s*>", re.IGNORECASE | re.DOTALL)
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_BLOCK_TAGS = (
    "p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|section|article|header|"
    "footer|blockquote|pre|hr"
)
_BLOCK_RE = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")

_KNOWN_CHARSETS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
}


def decode_html(raw: bytes) -> str:
    """Charset-declared decode with utf-8 -> latin-1 fallback (deterministic)."""
    m = _CHARSET_RE.search(raw[:2048])
    if m:
        cs = _KNOWN_CHARSETS.get(m.group(1).decode("ascii", "replace").lower())
        if cs:
            try:
                return raw.decode(cs)
            except (UnicodeDecodeError, LookupError):
                pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def html_to_text(raw: bytes) -> str:
    """Extract visible text: title line, then body block lines."""
    doc = decode_html(raw)
    doc = _COMMENT_RE.sub(" ", doc)
    doc = _SCRIPT_RE.sub(" ", doc)

    title = ""
    tm = _TITLE_RE.search(doc)
    if tm:
        title = html_mod.unescape(_TAG_RE.sub(" ", tm.group(1))).strip()
        title = _HSPACE_RE.sub(" ", title)
    # drop <head> so its metadata never leaks into body text
    doc = _HEAD_RE.sub(" ", doc)

    doc = _BLOCK_RE.sub("\n", doc)
    doc = _TAG_RE.sub(" ", doc)
    doc = html_mod.unescape(doc)

    lines = []
    for line in doc.split("\n"):
        line = _HSPACE_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    # de-duplicate a leading <h1> that repeats the title (single leading copy)
    if title and lines and lines[0] == title:
        lines = lines[1:]
    out = [title] if title else []
    out.extend(lines)
    return "\n".join(out)


def with_extracted_text(pages: DataFrame, html_col: str = "html",
                        out_col: str = "text") -> DataFrame:
    """Add/replace the extracted-text column via an Arrow-batched pandas UDF.

    Purely per-row -> narrow transformation, no shuffle; scales linearly with
    input splits.
    """
    @F.pandas_udf(T.StringType())
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(html_to_text)

    return pages.withColumn(out_col, _extract(F.col(html_col)))


def extraction_parity(pages: DataFrame) -> DataFrame:
    """Rows where re-extraction from html does NOT byte-match the stored text
    (the BASELINE.md invariant check); empty result = pass."""
    redone = with_extracted_text(pages, out_col="_re_text")
    return redone.filter(F.col("_re_text") != F.col("text")) \
                 .select("url", "text", "_re_text")
