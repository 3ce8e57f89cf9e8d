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


# ---------------------------------------------------------------------------
# rpq_reachable — regular path queries (automaton-product BFS)
# ---------------------------------------------------------------------------
def _rpq_ref(triples, seeds, transitions, accept, start=0):
    from collections import defaultdict
    trans = defaultdict(list)
    for a, pr, b in transitions:
        trans[(a, pr)].append(b)
    adj = defaultdict(list)
    for s, p, o in triples:
        adj[s].append((p, o))
    out = set()
    for seed in seeds:
        seen = {(seed, start)}
        stack = [(seed, start)]
        while stack:
            node, st = stack.pop()
            for pr, nxt in adj[node]:
                for nst in trans[(st, pr)]:
                    if (nxt, nst) not in seen:
                        seen.add((nxt, nst))
                        stack.append((nxt, nst))
        out |= {(seed, n, st) for n, st in seen if st in accept}
    return out


def test_rpq_kleene_then_labels(spark):
    from climatemind_ontology_processing_spark.operators.traversal import (
        rpq_reachable)
    T = [("c1", "buys_from", "c2"), ("c2", "buys_from", "c3"),
         ("c3", "in_nation", "n1"), ("c1", "in_nation", "n2"),
         ("n1", "in_region", "r1"), ("n2", "in_region", "r2"),
         ("n2", "buys_from", "c1")]
    trans = [(0, "buys_from", 0), (0, "in_nation", 1), (1, "in_region", 2)]
    tdf = _t(spark, T)
    sdf = spark.createDataFrame([("c1",)], "id string")
    got = {(r.seed, r.node, r.state)
           for r in rpq_reachable(tdf, sdf, trans, (2,)).collect()}
    assert got == _rpq_ref(T, ["c1"], trans, {2})
    # sanity: both regions reachable (direct nation + 2-hop supply chain)
    assert {"r1", "r2"} == {n for _, n, _ in got}


def test_rpq_accepting_start_state_and_multi_seed(spark):
    from climatemind_ontology_processing_spark.operators.traversal import (
        rpq_reachable)
    T = [("a", "p", "b"), ("b", "p", "c")]
    trans = [(0, "p", 0)]
    tdf = _t(spark, T)
    sdf = spark.createDataFrame([("a",), ("b",)], "id string")
    got = {(r.seed, r.node)
           for r in rpq_reachable(tdf, sdf, trans, (0,)).collect()}
    # state 0 accepts: seeds themselves + kleene closure
    assert got == {("a", "a"), ("a", "b"), ("a", "c"),
                   ("b", "b"), ("b", "c")}


def test_rpq_guards(spark):
    from climatemind_ontology_processing_spark.operators.traversal import (
        rpq_reachable)
    tdf = _t(spark, [("a", "p", "b")])
    sdf = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError):
        rpq_reachable(tdf, sdf, [], (0,))
    with pytest.raises(ValueError):
        rpq_reachable(tdf, sdf, [(0, "p", 0)], ())


def test_schema_summary_types_and_counts(spark):
    from climatemind_ontology_processing_spark.operators.kgops import (
        schema_summary)
    t = _t(spark, [("c:1", "in", "n:1"), ("c:2", "in", "n:1"),
                   ("c:2", "in", "n:1"),          # dup collapses
                   ("n:1", "part", "r:9"), ("x", "p", "y")])
    got = {(r.subj_type, r.pred, r.obj_type): (r.n_triples, r.n_subj, r.n_obj)
           for r in schema_summary(t).collect()}
    assert got == {("c", "in", "n"): (2, 2, 1),
                   ("n", "part", "r"): (1, 1, 1),
                   ("x", "p", "y"): (1, 1, 1)}
