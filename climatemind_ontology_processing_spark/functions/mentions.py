"""Mention detection against a broadcast concept dictionary.

Replaces the reference's per-row ``onto.search_one(label=...)`` nested-loop
lookup (``make_graph_class.py:114``) with a batched scan: the alias->concept
dict is broadcast once per job, compiled into a single alternation regex per
executor process (cached module-globally, so compilation cost is paid once per
worker, not per batch), and applied over Arrow record batches via
``mapInPandas``.  For a dictionary of hundreds of aliases the compiled-regex
scan is C-speed and equivalent to an Aho-Corasick pass.

Output: one row per (url, concept) mention occurrence with char position.
"""
from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MENTIONS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("concept", T.StringType(), False),
    T.StructField("surface", T.StringType(), False),
    T.StructField("pos", T.IntegerType(), False),
])

# per-process single-entry compile cache.  Long-lived Python workers
# deserialize a FRESH alias dict per task, so an id()-keyed cache would grow
# one (regex + dict) entry per task forever; keying on a content hash and
# keeping only the latest entry bounds memory to one compiled dictionary.
_REGEX_CACHE: list = [None, None, None]  # [content_key, pattern, aliases]


def _alias_key(aliases: dict[str, str]) -> int:
    return hash(frozenset(aliases.items()))


def _compiled(aliases: dict[str, str]) -> tuple[re.Pattern, dict[str, str]]:
    """Longest-first alternation over all alias surface forms, word-bounded."""
    key = _alias_key(aliases)
    if _REGEX_CACHE[0] == key:
        return _REGEX_CACHE[1], _REGEX_CACHE[2]
    ordered = sorted(aliases, key=len, reverse=True)
    pat = re.compile(
        r"(?<![A-Za-z0-9])(" + "|".join(re.escape(a) for a in ordered) + r")(?![A-Za-z0-9])",
        re.IGNORECASE,
    )
    _REGEX_CACHE[0], _REGEX_CACHE[1], _REGEX_CACHE[2] = key, pat, aliases
    return pat, aliases


def scan_text(text: str, aliases: dict[str, str]) -> list[tuple[str, str, int]]:
    """All dictionary mentions in one document -> [(concept, surface, pos)]."""
    pat, lookup = _compiled(aliases)
    out = []
    for m in pat.finditer(text):
        surface = m.group(1)
        concept = lookup.get(surface.lower())
        if concept is not None:
            out.append((concept, surface, m.start()))
    return out


def detect_mentions(pages: DataFrame, aliases: dict[str, str],
                    text_col: str = "text", lang_filter: str | None = "en") -> DataFrame:
    """pages -> mentions table.  Narrow (no shuffle); dictionary rides inside
    the serialized closure (small) and is compiled once per executor."""
    if lang_filter is not None:
        pages = pages.filter(pages["lang"] == lang_filter)
    cols = pages.select("url", "warc_ts", text_col)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf[text_col]):
                for concept, surface, pos in scan_text(text or "", aliases):
                    rows.append((url, ts, concept, surface, pos))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "concept",
                                              "surface", "pos"])

    return cols.mapInPandas(scan, MENTIONS_SCHEMA)
