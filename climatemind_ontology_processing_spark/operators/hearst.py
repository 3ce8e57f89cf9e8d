"""Hearst-pattern hypernym extraction over free text.

Not in the reference (its relations come from a curated OWL ontology —
``/root/reference/ontology_processing/graph_creation/ontology_processing_utils.py``
consumes hand-authored ``causes_or_promotes`` / ``is_inhibited_or_prevented_by``
properties).  At web scale the is-a backbone of the KG has to be *mined*
from text; the standard baseline is Hearst (1992) lexico-syntactic
patterns ("X such as Y", "Y and other X", "X, including Y",
"X, especially Y").

Spark-first shape: the whole extractor is JVM-side regex work
(``regexp_extract_all`` + ``regexp_extract`` + ``split``) — no Python UDF,
so it whole-stage-codegens and scales as a pure map over the corpus.  The
patterns are deliberately engine-portable (no lookarounds, no backrefs) so
the same extraction replays on RE2-based engines (the DuckDB oracle runs
them verbatim).

NP approximation: a single lowercase token ``[a-z][a-z0-9_-]*``.  A real
deployment would swap in a chunker via mapInPandas; the pattern algebra
(match → group-split → explode → aggregate) is unchanged.

Known Hearst artifact (kept, documented): the hypo-list capture is greedy,
so "metals such as iron, copper and other elements" yields hypos
{iron, copper, other, elements} for hyper=metals — the classic
pattern-overlap noise that downstream taxonomy cleaning (dedup +
acyclic cut) removes.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NP = r"[a-z][a-z0-9_-]*"
_JOINER = r"(?:, | and | or )"
_LIST = rf"(?:{_NP}{_JOINER})*{_NP}"

#: pattern name -> (regex, hyper group idx, hypo-list group idx)
HEARST_PATTERNS: dict[str, tuple[str, int, int]] = {
    "such_as":    (rf"\b({_NP}) such as ({_LIST})", 1, 2),
    "including":  (rf"\b({_NP}),? including ({_LIST})", 1, 2),
    "especially": (rf"\b({_NP}),? especially ({_LIST})", 1, 2),
    "and_other":  (rf"\b({_LIST}),? and other ({_NP})", 2, 1),
    "or_other":   (rf"\b({_LIST}),? or other ({_NP})", 2, 1),
}


def hearst_matches(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   patterns: dict[str, tuple[str, int, int]] | None = None,
                   ) -> DataFrame:
    """One row per (doc, pattern match, hypo token).

    Output: (<id_col>, hypo, hyper, pattern).  Text is lowercased before
    matching; matches are leftmost non-overlapping per pattern (patterns
    are independent — the same span may fire several patterns, which is
    what the per-pattern provenance column is for).
    """
    pats = patterns or HEARST_PATTERNS
    outs = []
    for name, (pat, g_hyper, g_list) in pats.items():
        lowered = F.lower(F.col(text_col))
        matched = docs.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(lowered, F.lit(pat), F.lit(0))
            ).alias("_m"))
        outs.append(matched.select(
            id_col,
            F.explode(
                F.split(F.regexp_extract("_m", pat, g_list), _JOINER)
            ).alias("hypo"),
            F.regexp_extract("_m", pat, g_hyper).alias("hyper"),
            F.lit(name).alias("pattern")))
    allm = reduce(DataFrame.unionByName, outs)
    return allm.filter((F.col("hypo") != "") & (F.col("hyper") != "")
                       & (F.col("hypo") != F.col("hyper")))


def hypernym_counts(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    patterns: dict[str, tuple[str, int, int]] | None = None,
                    ) -> DataFrame:
    """Corpus-level is-a evidence: (hypo, hyper, pattern, n_matches,
    n_docs).  The aggregate is map-side combinable (plain groupBy over the
    exploded matches) — corpus size only widens the map stage."""
    m = hearst_matches(docs, text_col, id_col, patterns)
    return (m.groupBy("hypo", "hyper", "pattern")
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


def hearst_triples(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_docs: int = 1,
                   patterns: dict[str, tuple[str, int, int]] | None = None,
                   ) -> DataFrame:
    """Distinct (subj, pred, obj) is-a triples with pooled evidence:
    pattern-agnostic totals, thresholded on distinct supporting docs.
    Feeds the same downstream shape as ``functions.triples`` output
    (canonicalize → acyclic cut → materialize)."""
    m = hearst_matches(docs, text_col, id_col, patterns)
    return (m.groupBy(F.col("hypo").alias("subj"), F.col("hyper").alias("obj"))
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.countDistinct(id_col).cast("long").alias("n_docs"))
            .filter(F.col("n_docs") >= F.lit(int(min_docs)))
            .select("subj", F.lit("is_a").alias("pred"), "obj",
                    "n_matches", "n_docs"))


# --- acronym-expansion mining -----------------------------------------------
# The alias-dictionary complement to anchor-text mining: "World Health
# Organization (WHO)" on the page IS the sameAs edge.  Lookaround-free
# and lazy-free so Java regex (Spark) and RE2 (DuckDB) agree.
ACRONYM_PATTERN = r"((?:[A-Z][A-Za-z]+ ){1,6})\(([A-Z]{2,7})\)"


def acronym_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(acronym, expansion, n_matches, n_docs) for every validated
    "Long Form (LF)" occurrence: candidate spans come from one portable
    regex (a run of 1-6 Capitalized words before a parenthesized 2-7
    letter uppercase token), then the candidate is KEPT iff the
    acronym's letters equal the initials of the expansion's LAST
    len(acronym) words — the Schwartz-Hearst validation reduced to pure
    array algebra (slice + transform + concat), no Python.

    Evidence is pooled corpus-wide with distinct-doc support, like
    ``hypernym_counts`` — one regex map + one aggregate."""
    m = docs.select(
        F.col(id_col),
        F.explode(F.arrays_zip(
            F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                 F.lit(ACRONYM_PATTERN), F.lit(1)),
            F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                 F.lit(ACRONYM_PATTERN), F.lit(2))))
        .alias("z"))
    cand = m.select(id_col,
                    F.trim(F.col("z").getField("0")).alias("expansion"),
                    F.col("z").getField("1").alias("acronym"))
    words = F.split(F.col("expansion"), " ")
    k = F.length("acronym")
    lastk = F.slice(words, F.size(words) - k + 1, k)
    initials = F.upper(F.concat_ws(
        "", F.transform(lastk, lambda w: F.substring(w, 1, 1))))
    valid = (cand.filter(F.size(words) >= k)
             .filter(initials == F.col("acronym"))
             .select(id_col, "acronym",
                     F.concat_ws(" ", lastk).alias("expansion")))
    return (valid.groupBy("acronym", "expansion")
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


# --- quote attribution -------------------------------------------------------
# (speaker, quote) evidence for provenance-bearing claim extraction:
# both canonical surface orders, lookaround-free and lazy-free so Java
# regex and RE2 agree.
_NAME = r"[A-Z][a-z]+(?: [A-Z][a-z]+){0,2}"
QUOTE_PRE_PATTERN = rf'({_NAME}) said[:,]? "([^"]{{5,300}})"'
QUOTE_POST_PATTERN = rf'"([^"]{{5,300}})," said ({_NAME})'


def quote_attributions(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(speaker, quote, n_matches, n_docs) for every attributed quote in
    either canonical order — ``Name said: "..."`` or ``"...," said
    Name`` — pooled corpus-wide with distinct-doc support (the
    hypernym_counts aggregation shape).  Speaker = 1-3 Capitalized
    words; quotes are unnested double-quote spans (nested/apostrophe
    quoting is out of scope, documented)."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    def matches(pattern, sp_idx, q_idx):
        z = F.arrays_zip(
            F.regexp_extract_all(t, F.lit(pattern), F.lit(sp_idx)),
            F.regexp_extract_all(t, F.lit(pattern), F.lit(q_idx)))
        return docs.select(F.col(id_col), F.explode(z).alias("m")) \
            .select(id_col, F.col("m").getField("0").alias("speaker"),
                    F.col("m").getField("1").alias("quote"))

    pre = matches(QUOTE_PRE_PATTERN, 1, 2)
    post = (matches(QUOTE_POST_PATTERN, 2, 1))
    return (pre.unionByName(post)
            .groupBy("speaker", "quote")
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))
