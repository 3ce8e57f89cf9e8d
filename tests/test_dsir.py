"""DSIR importance scoring (operators/dsir.py)."""
from __future__ import annotations

import pyspark.sql.functions as F

from climatemind_ontology_processing_spark.operators.dsir import (
    dsir_scores, dsir_select, hashed_ngram_counts)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_features_unigrams_plus_bigrams(spark):
    f = hashed_ngram_counts(_docs(spark, [(1, "a b c"), (2, ""), (3, None)]))
    rows = f.collect()
    # "a b c" -> 3 unigrams + 2 bigrams = 5 features; empty/null -> none
    assert sum(r.cnt for r in rows) == 5
    assert {r.id for r in rows} == {1}


def test_target_like_doc_outranks_dissimilar(spark):
    tgt = _docs(spark, [
        (100, "solar panels convert sunlight into clean electricity"),
        (101, "wind turbines generate renewable electricity from wind"),
        (102, "clean renewable electricity replaces fossil generation"),
    ])
    raw = _docs(spark, [
        (1, "solar panels and wind turbines produce clean electricity"),
        (2, "the recipe calls for butter sugar flour and three eggs"),
        (3, ""),
    ])
    s = {r.id: r.score_micro for r in dsir_scores(raw, tgt).collect()}
    assert set(s) == {1, 2, 3}, "every raw doc present, even token-free"
    assert s[1] > s[2], "target-vocabulary doc must outrank the recipe"
    assert s[3] == 0
    # selection: the empty doc's 0 would outrank the net-negative real docs
    # (tiny corpora make most raw ngrams raw-specific) — min_ngrams=1
    # excludes no-evidence docs, so the target-like doc wins
    top = [r.id for r in dsir_select(raw, tgt, 1).collect()]
    assert top == [1]
    with_empty = [r.id for r in dsir_select(raw, tgt, 1,
                                            min_ngrams=0).collect()]
    assert with_empty == [3], "audit mode keeps the 0-score empty doc"


def test_topk_is_prefix_and_deterministic(spark):
    tgt = _docs(spark, [(100, "alpha beta gamma delta")])
    raw = _docs(spark, [(i, f"alpha beta token{i} filler words") for i in
                        range(8)])
    k2 = [r.id for r in dsir_select(raw, tgt, 2).collect()]
    k4 = [r.id for r in dsir_select(raw, tgt, 4).collect()]
    assert k4[:2] == k2, "same total order: smaller k is a prefix"
    again = [r.id for r in dsir_select(raw, tgt, 4).collect()]
    assert again == k4


def test_hash_families_agree_on_ranking_structure(spark):
    """xxhash64 (production) and md5_60 (oracle) bucket differently but with
    identical machinery — on collision-free-sized inputs the induced ranking
    of clearly-separated docs must agree."""
    tgt = _docs(spark, [(100, "graph edges nodes components labels")])
    raw = _docs(spark, [
        (1, "graph edges nodes everywhere"),
        (2, "completely unrelated culinary narrative about pastry"),
    ])
    for fam in ("xxhash64", "md5_60"):
        s = {r.id: r.score_micro for r in
             dsir_scores(raw, tgt, hash_family=fam).collect()}
        assert s[1] > s[2], fam
