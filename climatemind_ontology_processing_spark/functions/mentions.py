"""Mention detection against a broadcast concept dictionary.

Replaces the reference's per-row ``onto.search_one(label=...)`` nested-loop
lookup (``make_graph_class.py:114``) with a batched scan over Arrow record
batches via ``mapInPandas``.  The alias->concept dict travels as a
``sparkContext.broadcast`` (shipped once per EXECUTOR, not serialized into
every task closure — a 10^6-alias web dictionary re-pickled per task would
dominate task launch).

Two matcher paths, equivalence-tested against each other:

* small dictionaries (<= ``REGEX_MAX_ALIASES``): one longest-first
  alternation regex — C-speed, exactly the word-boundary semantics below;
* large dictionaries: a token-anchored multi-pattern scanner (the
  Aho-Corasick shape for word-bounded phrase sets): index aliases by first
  word -> candidate word-lengths, walk the text's token positions, and probe
  the literal substring spanning each candidate length against the hash set.
  O(tokens x lengths-per-first-word) dict lookups, independent of alias
  count — an alternation regex degrades linearly in alias count.
  (pyahocorasick would drop in here; it is not available in this
  environment, and the token scanner has the same asymptotics for
  word-anchored patterns.)

Match semantics (both paths): case-insensitive, word-bounded (no [A-Za-z0-9]
immediately before or after), leftmost-longest, non-overlapping.

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

# above this alias count the alternation regex degrades; switch to the
# token-anchored scanner whose cost is independent of dictionary size
REGEX_MAX_ALIASES = 2000

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

# ASCII alphanumerics, matching the regex path's [A-Za-z0-9] word boundary.
# str.isalnum() is Unicode-aware and would diverge (e.g. 'é' is alnum to
# Python but a boundary to the regex).
_ASCII_ALNUM = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")

# per-process single-entry compile cache.  Long-lived Python workers
# deserialize a FRESH alias dict per task when it rides in the closure, so an
# id()-keyed cache would grow one (matcher + dict) entry per task forever;
# keying on a content hash and keeping only the latest entry bounds memory to
# one compiled dictionary.  The content hash costs O(|dictionary|), so
# callers resolve the matcher once per TASK (detect_mentions) — never per
# row.
_MATCHER_CACHE: list = [None, None]          # [content_key, matcher]


def _alias_key(aliases: dict[str, str]) -> int:
    return hash(frozenset(aliases.items()))


class _RegexMatcher:
    """Longest-first alternation over all alias surface forms, word-bounded."""

    def __init__(self, aliases: dict[str, str]):
        ordered = sorted(aliases, key=len, reverse=True)
        self.pat = re.compile(
            r"(?<![A-Za-z0-9])(" + "|".join(re.escape(a) for a in ordered)
            + r")(?![A-Za-z0-9])", re.IGNORECASE)
        self.lookup = aliases

    def scan(self, text: str) -> list[tuple[str, str, int]]:
        out = []
        for m in self.pat.finditer(text):
            surface = m.group(1)
            concept = self.lookup.get(surface.lower())
            if concept is not None:
                out.append((concept, surface, m.start()))
        return out


class _TokenMatcher:
    """Token-anchored multi-phrase scanner; cost independent of alias count.

    Aliases are indexed by lowercased first word -> the distinct token
    lengths of aliases starting with that word (longest first).  At each
    token position whose word is in the index, the LITERAL text substring
    spanning each candidate length is probed against the alias hash map —
    so inter-word punctuation/whitespace must match the alias exactly,
    the same as the escaped-regex path.
    """

    def __init__(self, aliases: dict[str, str]):
        self.lookup = aliases
        # first word (lowercased) -> distinct alias CHAR lengths, longest
        # first.  Probing by char length keeps the literal-substring
        # semantics for aliases with internal/trailing punctuation, e.g.
        # "…food-chain (plant-rich diets)".
        self.by_first: dict[str, list[int]] = {}
        for a in aliases:
            m = _TOKEN_RE.search(a)
            if m is None or m.start() != 0:
                # alias starting with a non-alnum char can't be anchored to a
                # token start; dictionary labels never do (documented limit)
                continue
            lens = self.by_first.setdefault(a[:m.end()].lower(), [])
            if len(a) not in lens:
                lens.append(len(a))
        for lens in self.by_first.values():
            lens.sort(reverse=True)           # longest-first

    def scan(self, text: str) -> list[tuple[str, str, int]]:
        toks = list(_TOKEN_RE.finditer(text))
        n = len(toks)
        out = []
        i = 0
        tlen = len(text)
        # lowercase PER SLICE, never the whole text: some Unicode lowerings
        # change string length ('İ' -> 'i̇'), which would misalign every
        # probe offset after the first such char against a whole-text lower()
        while i < n:
            s = toks[i].start()
            lens = self.by_first.get(text[s:toks[i].end()].lower())
            matched_end = None
            if lens:
                for L in lens:
                    e = s + L
                    if e > tlen:
                        continue
                    # word boundary after the span (before is guaranteed:
                    # token starts follow a non-alnum char by construction).
                    # ASCII-only check — the regex path's boundary is
                    # [A-Za-z0-9], not Unicode isalnum()
                    if e < tlen and text[e] in _ASCII_ALNUM:
                        continue
                    concept = self.lookup.get(text[s:e].lower())
                    if concept is not None:
                        out.append((concept, text[s:e], s))
                        matched_end = e
                        break
            i += 1
            if matched_end is not None:       # non-overlapping: skip inside
                while i < n and toks[i].start() < matched_end:
                    i += 1
        return out


def _matcher(aliases: dict[str, str]):
    key = _alias_key(aliases)
    if _MATCHER_CACHE[0] == key:
        return _MATCHER_CACHE[1]
    m = (_RegexMatcher(aliases) if len(aliases) <= REGEX_MAX_ALIASES
         else _TokenMatcher(aliases))
    _MATCHER_CACHE[0], _MATCHER_CACHE[1] = key, m
    return m


def scan_text(text: str, aliases: dict[str, str],
              force: str | None = None) -> list[tuple[str, str, int]]:
    """All dictionary mentions in one document -> [(concept, surface, pos)].
    ``force`` ∈ {'regex', 'tokens'} pins a path (tests)."""
    if force == "regex":
        return _RegexMatcher(aliases).scan(text)
    if force == "tokens":
        return _TokenMatcher(aliases).scan(text)
    return _matcher(aliases).scan(text)


def detect_mentions(pages: DataFrame, aliases: dict[str, str],
                    text_col: str = "text", lang_filter: str | None = "en") -> DataFrame:
    """pages -> mentions table.  Narrow (no shuffle); the dictionary ships
    via ``sparkContext.broadcast`` (once per executor) and the matcher is
    compiled once per worker process."""
    if lang_filter is not None:
        pages = pages.filter(pages["lang"] == lang_filter)
    cols = pages.select("url", "warc_ts", text_col)
    bc = pages.sparkSession.sparkContext.broadcast(aliases)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolve the matcher ONCE per task — the cache key is a content
        # hash (O(|dictionary|) to compute), which must not run per row
        matcher = _matcher(bc.value)
        for pdf in batches:
            rows = []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf[text_col]):
                for concept, surface, pos in matcher.scan(text or ""):
                    rows.append((url, ts, concept, surface, pos))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "concept",
                                              "surface", "pos"])

    return cols.mapInPandas(scan, MENTIONS_SCHEMA)
