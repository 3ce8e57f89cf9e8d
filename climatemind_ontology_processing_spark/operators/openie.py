"""ReVerb-style open information extraction over free text.

The reference's relations come from a curated OWL ontology (hand-authored
``causes_or_promotes`` etc. —
/root/reference/ontology_processing/graph_creation/ontology_processing_utils.py);
its only text processing is dictionary lookup.  At web scale the KG needs
OPEN relation extraction — triples whose predicate is a free-text phrase,
not a closed vocabulary.  The standard pattern-based baseline is ReVerb
(Fader, Soderland & Etzioni, EMNLP 2011): a relation phrase is a verb,
optionally followed by a preposition, flanked by noun-phrase arguments,
with lexical constraints keeping relation words out of argument slots.

Spark-first shape, same as operators/hearst.py: one engine-portable regex
(no lookarounds, no backrefs) evaluated JVM-side with
``regexp_extract_all`` (leftmost non-overlapping matches) + per-group
``regexp_extract`` — a pure whole-stage-codegen map over the corpus, no
Python.  The DuckDB oracle runs the identical regex under RE2, so a hash
match certifies Java-regex ≡ RE2 for the pattern class.

POS-tagging approximation (documented, same trade as hearst.py's NP):
verbs and prepositions come from explicit LEXICONS instead of a tagger,
and an NP is a single lowercase token.  A real deployment swaps in a
tagger/chunker via mapInPandas; the pattern algebra (match → group-split
→ filter → aggregate) is unchanged.

Two-phase semantics note: the lexical argument constraints are applied
AFTER span matching, so a rejected match still consumed its span (no
re-matching inside it) — deterministic, and replayed identically by the
oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NP = r"[a-z][a-z0-9_-]*"

#: default preposition / determiner closed classes (ReVerb's POS classes
#: IN / DT, lexicon-approximated).
DEFAULT_PREPS: tuple[str, ...] = ("of", "in", "on", "with", "to", "by",
                                  "for", "from")
DEFAULT_DETS: tuple[str, ...] = ("the", "a", "an")


def reverb_pattern(verbs: tuple[str, ...],
                   preps: tuple[str, ...] = DEFAULT_PREPS,
                   dets: tuple[str, ...] = DEFAULT_DETS) -> str:
    """The ReVerb-lite surface pattern:

        (NP) (V [P]) [DET] (NP)

    groups: 1 = arg1, 2 = relation phrase, 3 = arg2.  Alternations are
    sorted longest-first so RE2's leftmost-longest and Java's greedy-alt
    behavior agree on overlapping lexicon entries (e.g. 'in' vs 'into').
    """
    if not verbs:
        raise ValueError("verbs lexicon must be non-empty")
    longest = lambda ws: "|".join(sorted(ws, key=len, reverse=True))
    v, p, d = (f"(?:{longest(x)})" for x in (verbs, preps, dets))
    return rf"\b({_NP}) ({v}(?: {p})?)(?: {d})? ({_NP})\b"


def reverb_matches(docs: DataFrame, verbs: tuple[str, ...],
                   preps: tuple[str, ...] = DEFAULT_PREPS,
                   dets: tuple[str, ...] = DEFAULT_DETS,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """One row per extraction: (<id_col>, arg1, rel, arg2).

    Text is lowercased; matches are leftmost non-overlapping.  ReVerb's
    lexical constraint is enforced post-match: an argument may not itself
    be a relation-class word (verb, preposition, determiner).
    """
    pat = reverb_pattern(verbs, preps, dets)
    stop = list(verbs) + list(preps) + list(dets)
    m = docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                       F.lit(pat), F.lit(0))).alias("_m"))
    out = m.select(
        id_col,
        F.regexp_extract("_m", pat, 1).alias("arg1"),
        F.regexp_extract("_m", pat, 2).alias("rel"),
        F.regexp_extract("_m", pat, 3).alias("arg2"))
    return out.filter(~F.col("arg1").isin(stop) & ~F.col("arg2").isin(stop)
                      & (F.col("arg1") != "") & (F.col("arg2") != ""))


def open_triple_counts(docs: DataFrame, verbs: tuple[str, ...],
                       preps: tuple[str, ...] = DEFAULT_PREPS,
                       dets: tuple[str, ...] = DEFAULT_DETS,
                       min_docs: int = 1, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus-level open triples with evidence: (arg1, rel, arg2,
    n_mentions, n_docs), thresholded on distinct supporting docs.  The
    aggregate is map-side combinable — corpus size only widens the map
    stage; output size is bounded by the distinct-triple vocabulary."""
    m = reverb_matches(docs, verbs, preps, dets, text_col, id_col)
    return (m.groupBy("arg1", "rel", "arg2")
            .agg(F.count("*").cast("long").alias("n_mentions"),
                 F.countDistinct(id_col).cast("long").alias("n_docs"))
            .filter(F.col("n_docs") >= F.lit(int(min_docs))))
