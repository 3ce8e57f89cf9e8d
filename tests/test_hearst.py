"""Hearst-pattern extraction: hand-checked cases + pure-Python re replica."""
from __future__ import annotations

import re

import pytest

from climatemind_ontology_processing_spark.operators.hearst import (
    HEARST_PATTERNS, _JOINER, hearst_matches, hearst_triples,
    hypernym_counts)

DOCS = [
    (0, "Metals such as iron, copper and zinc conduct heat."),
    (1, "We ship containers, including drums or crates, worldwide."),
    (2, "Rivers, especially nile and amazon, flood yearly."),
    (3, "Iron, zinc and other metals are mined here."),
    (4, "Drums or other containers hold cargo."),
    (5, "no pattern in this sentence at all"),
    (6, "metals such as iron. iron, zinc and other metals."),  # two patterns
    (7, "things such as things"),  # hypo == hyper dropped
]


def _python_matches(docs):
    out = []
    for doc_id, text in docs:
        t = text.lower()
        for name, (pat, g_hyper, g_list) in HEARST_PATTERNS.items():
            for m in re.finditer(pat, t):
                hyper = m.group(g_hyper)
                for hypo in re.split(_JOINER, m.group(g_list)):
                    if hypo and hyper and hypo != hyper:
                        out.append((doc_id, hypo, hyper, name))
    return sorted(out)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_equal_python_re(spark, docs_df):
    got = sorted(tuple(r) for r in hearst_matches(docs_df).collect())
    assert got == _python_matches(DOCS)


def test_hand_checked_cases(spark, docs_df):
    rows = {(r["doc_id"], r["hypo"], r["hyper"], r["pattern"])
            for r in hearst_matches(docs_df).collect()}
    # such_as list with trailing "and"
    assert (0, "iron", "metals", "such_as") in rows
    assert (0, "copper", "metals", "such_as") in rows
    assert (0, "zinc", "metals", "such_as") in rows
    # including with comma, "or" joiner
    assert (1, "drums", "containers", "including") in rows
    assert (1, "crates", "containers", "including") in rows
    # especially
    assert (2, "nile", "rivers", "especially") in rows
    assert (2, "amazon", "rivers", "especially") in rows
    # and_other: list precedes hyper
    assert (3, "iron", "metals", "and_other") in rows
    assert (3, "zinc", "metals", "and_other") in rows
    # or_other
    assert (4, "drums", "containers", "or_other") in rows
    # non-matching doc and self-pair contribute nothing
    assert not any(r[0] in (5, 7) for r in rows)


def test_counts_and_triples(spark, docs_df):
    counts = {(r["hypo"], r["hyper"], r["pattern"]): (r["n_matches"],
                                                      r["n_docs"])
              for r in hypernym_counts(docs_df).collect()}
    # iron->metals seen via such_as in docs 0 and 6
    assert counts[("iron", "metals", "such_as")] == (2, 2)
    # and via and_other in docs 3 and 6
    assert counts[("iron", "metals", "and_other")] == (2, 2)

    trip = {(r["subj"], r["pred"], r["obj"]): (r["n_matches"], r["n_docs"])
            for r in hearst_triples(docs_df).collect()}
    # pooled across patterns, n_docs distinct (docs 0,3,6 => 3 not 4)
    assert trip[("iron", "is_a", "metals")] == (4, 3)

    strict = hearst_triples(docs_df, min_docs=3).collect()
    assert {(r["subj"], r["obj"]) for r in strict} == {("iron", "metals"),
                                                       ("zinc", "metals")}


# ---------------------------------------------------------------------------
# acronym_pairs — Schwartz-Hearst-style validated acronym mining
# ---------------------------------------------------------------------------
def test_acronym_pairs_validation(spark):
    from climatemind_ontology_processing_spark.operators.hearst import (
        acronym_pairs)
    rows = [
        (0, "the World Health Organization (WHO) said and the "
            "Internal Revenue Service (IRS) replied"),
        (1, "World Health Organization (WHO) again"),
        # initials don't match the acronym -> rejected
        (2, "Some Random Words (XYZ) here"),
        # acronym longer than the captured words -> rejected
        (3, "Big Co (ABCDEF) nope"),
        # prefix word beyond the acronym length is trimmed: initials of
        # the LAST 2 words validate 'Machine Learning (ML)'
        (4, "Applied Machine Learning (ML) works"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.acronym, r.expansion): (r.n_matches, r.n_docs)
           for r in acronym_pairs(docs).collect()}
    assert got == {
        ("WHO", "World Health Organization"): (2, 2),
        ("IRS", "Internal Revenue Service"): (1, 1),
        ("ML", "Machine Learning"): (1, 1),
    }


def test_quote_attributions_both_orders(spark):
    from climatemind_ontology_processing_spark.operators.hearst import (
        quote_attributions)
    rows = [
        (0, 'Jane Doe said: "the model improved" and later '
            '"costs went down," said Bob Smith'),
        (1, 'Jane Doe said "the model improved" again'),
        (2, 'nobody said "anything attributable here'),   # unclosed
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.speaker, r.quote): (r.n_matches, r.n_docs)
           for r in quote_attributions(docs).collect()}
    assert got == {
        ("Jane Doe", "the model improved"): (2, 2),
        ("Bob Smith", "costs went down"): (1, 1),
    }
