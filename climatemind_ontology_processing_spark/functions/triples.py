"""Cue-pattern (subj, pred, obj) triple extraction from extracted text.

The reference emits triples by walking object-property links of a curated
ontology (``network_class.py:46-63,121-156``, materialized with columns
subject/object/predicate at ``make_network.py:41-43``).  At web scale the
triples come from text instead: sentence-level cue patterns whose slots must
BOTH resolve against the broadcast alias dictionary (precision — non-dictionary
entities never produce triples), emitted with provenance (url, warc_ts) and a
score.

Cue grammar (matches sources/pages.py templates, which mirror the reference's
edge-type vocabulary):
    "<A> causes <B>"  "<A> leads to <B>"       -> (A, causes_or_promotes, B)
    "<A> is inhibited by <B>"                   -> (A, is_inhibited_..., B)
    "<B> prevents <A>"                          -> (A, is_inhibited_..., B)
    "<M> is a myth about <B>"                   -> (M, is_a_myth_about, B)

Note the reference's direction convention: ``parent is_inhibited_by child``
means child inhibits parent (``network_class.py:57`` stores (parent, child,
prop)), so "B prevents A" maps to subj=A, obj=B.
"""
from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CAUSES, EXPOSURE, INHIBITS, MYTH_ABOUT, POPULATION

TRIPLES_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("score", T.DoubleType(), False),
])

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+|\n+")

# (regex, pred, swap_slots) — slot1/slot2 are candidate surface forms
_CUE_PATTERNS: list[tuple[re.Pattern, str, bool]] = [
    (re.compile(r"^(.+?)\s+causes\s+(.+?)$", re.IGNORECASE), CAUSES, False),
    (re.compile(r"^(.+?)\s+leads to\s+(.+?)$", re.IGNORECASE), CAUSES, False),
    (re.compile(r"^(.+?)\s+is inhibited by\s+(.+?)$", re.IGNORECASE), INHIBITS, False),
    (re.compile(r"^(.+?)\s+prevents\s+(.+?)$", re.IGNORECASE), INHIBITS, True),
    (re.compile(r"^(.+?)\s+is a myth about\s+(.+?)$", re.IGNORECASE), MYTH_ABOUT, False),
    (re.compile(r"^(.+?)\s+has exposure dependency of\s+(.+?)$", re.IGNORECASE),
     EXPOSURE, False),
    (re.compile(r"^(.+?)\s+affects the population of\s+(.+?)$", re.IGNORECASE),
     POPULATION, False),
]

_TRAIL_PUNCT = re.compile(r"[\s.!?,;:]+$")


def _link_score(surface: str, canonical: str) -> float:
    """Entity-link score (north_star "entity-link scoring"): exact canonical
    label -> 1.0, alias/morphological variant -> 0.9.  Deterministic; richer
    scorers (edit distance, context) slot in here."""
    return 1.0 if surface.strip().lower() == canonical.lower() else 0.9


def extract_from_text(text: str, aliases: dict[str, str]) -> list[tuple[str, str, str, float]]:
    """One document -> [(subj, pred, obj, score)].  Both slots must resolve;
    the triple score is the product of the two slot link scores."""
    out = []
    for sent in _SENT_SPLIT.split(text):
        sent = _TRAIL_PUNCT.sub("", sent.strip())
        if not sent:
            continue
        for pat, pred, swap in _CUE_PATTERNS:
            m = pat.match(sent)
            if not m:
                continue
            surf1, surf2 = m.group(1).strip(), m.group(2).strip()
            s1 = aliases.get(surf1.lower())
            s2 = aliases.get(surf2.lower())
            if s1 is None or s2 is None:
                continue
            score = _link_score(surf1, s1) * _link_score(surf2, s2)
            if swap:
                s1, s2 = s2, s1
            out.append((s1, pred, s2, round(score, 4)))
            break  # first matching cue wins per sentence
    return out


def extract_triples(pages: DataFrame, aliases: dict[str, str],
                    text_col: str = "text", lang_filter: str | None = "en") -> DataFrame:
    """pages -> raw triples table (duplicates allowed; dedupe downstream with
    ``operators.dedup.dedup_triples`` — mirrors ``make_network.py:44``).

    Narrow stage: per-page work only, dictionary in closure, Arrow batches.
    """
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    cols = pages.select("url", "warc_ts", text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf[text_col]):
                for subj, pred, obj, score in extract_from_text(text or "", aliases):
                    rows.append((subj, pred, obj, url, ts, score))
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj", "url",
                                              "warc_ts", "score"])

    return cols.mapInPandas(run, TRIPLES_SCHEMA)


def extract_triples_from_html(pages: DataFrame, aliases: dict[str, str],
                              lang_filter: str | None = "en") -> DataFrame:
    """FUSED hot path: html -> text -> triples in ONE mapInPandas stage.

    Chaining the text UDF and the triple UDF separately costs two
    JVM<->Python Arrow crossings per row batch (and two Python worker
    processes per task); fusing them halves the crossings — this is the
    10^12-document production path.  Byte-identity of the intermediate text is
    guaranteed by calling the same ``html_to_text`` and is separately enforced
    by ``functions.text.extraction_parity``.
    """
    from .text import html_to_text

    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    cols = pages.select("url", "warc_ts", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, ts, raw in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                text = html_to_text(bytes(raw))
                for subj, pred, obj, score in extract_from_text(text, aliases):
                    rows.append((subj, pred, obj, url, ts, score))
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj", "url",
                                              "warc_ts", "score"])

    return cols.mapInPandas(run, TRIPLES_SCHEMA)
