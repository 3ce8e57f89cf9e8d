"""KG snapshot diff + entity fact ranking."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.kgops import (
    entity_fact_ranking, kg_diff, kg_diff_stats)


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_kg_diff_added_removed_and_set_semantics(spark):
    old = _t(spark, [("a", "p", "x"), ("a", "p", "x"), ("b", "p", "y"),
                     ("c", "q", "z")])
    new = _t(spark, [("a", "p", "x"), ("b", "p", "y2"), ("c", "q", "z")])
    got = {(r.subj, r.pred, r.obj, r.change)
           for r in kg_diff(old, new).collect()}
    assert got == {("b", "p", "y2", "added"), ("b", "p", "y", "removed")}


def test_kg_diff_stats_per_predicate(spark):
    old = _t(spark, [("a", "p", "1"), ("b", "p", "2"), ("c", "q", "3")])
    new = _t(spark, [("a", "p", "1"), ("b", "p", "9"), ("d", "r", "4")])
    got = {r.pred: (r.n_added, r.n_removed, r.n_unchanged)
           for r in kg_diff_stats(old, new).collect()}
    assert got == {"p": (1, 1, 1), "q": (0, 1, 0), "r": (1, 0, 0)}


def test_entity_fact_ranking_rarest_first(spark):
    t = _t(spark, [
        ("e1", "common", "x1"), ("e2", "common", "x2"),
        ("e3", "common", "x3"),
        ("e1", "rare", "r1"),
        ("e1", "mid", "m1"), ("e2", "mid", "m2"),
    ])
    got = {(r.subj, r.rank): (r.pred, r.obj, r.pred_count)
           for r in entity_fact_ranking(t, top_k=2).collect()}
    assert got[("e1", 1)] == ("rare", "r1", 1)
    assert got[("e1", 2)] == ("mid", "m1", 2)
    assert got[("e2", 1)] == ("mid", "m2", 2)
    assert got[("e3", 1)] == ("common", "x3", 3)
    assert ("e3", 2) not in got        # only one fact


def test_entity_fact_ranking_deterministic_ties(spark):
    t = _t(spark, [("e", "p", "b"), ("e", "p", "a"), ("e", "q", "c")])
    got = [(r.rank, r.pred, r.obj)
           for r in entity_fact_ranking(t, top_k=3).collect()]
    # p and q counts: p=2, q=1 -> q first, then p by obj asc
    assert sorted(got) == [(1, "q", "c"), (2, "p", "a"), (3, "p", "b")]


def test_entity_fact_ranking_k_guard(spark):
    with pytest.raises(ValueError):
        entity_fact_ranking(_t(spark, [("a", "p", "x")]), top_k=0)


# ---------------------------------------------------------------------------
# fingerprint canonicalization
# ---------------------------------------------------------------------------
def test_fingerprint_key_normalization(spark):
    from pyspark.sql import functions as F
    from climatemind_ontology_processing_spark.operators.canonicalize import (
        fingerprint_key)
    rows = [("Smith, John",), ("john SMITH!",), ("john  smith smith",),
            ("Jane Doe",)]
    df = spark.createDataFrame(rows, "name string")
    got = [r.fp for r in df.select(
        fingerprint_key(F.col("name")).alias("fp")).collect()]
    assert got[0] == got[1] == got[2] == "john smith"
    assert got[3] == "doe jane"


def test_fingerprint_clusters_min_size_and_rep(spark):
    from climatemind_ontology_processing_spark.operators.canonicalize import (
        fingerprint_clusters)
    rows = [(1, "Acme Corp"), (2, "corp ACME"), (3, "acme corp."),
            (4, "Unique Name")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {r.id: (r.fp, r.n_ids, r.rep)
           for r in fingerprint_clusters(df, "name").collect()}
    assert set(got) == {1, 2, 3}
    assert all(v == ("acme corp", 3, 1) for v in got.values())
