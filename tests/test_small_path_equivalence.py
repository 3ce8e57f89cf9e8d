"""Round-6 size-adaptive paths: driver-side small-graph results must be
row-identical to the distributed branches (the optimization round added
small paths to these operators; the existing operator tests now exercise
the DRIVER path by default, so this file pins the distributed one)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import climatemind_ontology_processing_spark.operators.traversal as trav
from climatemind_ontology_processing_spark.operators.anf import hyperball
from climatemind_ontology_processing_spark.operators.betweenness import (
    sampled_betweenness)
from climatemind_ontology_processing_spark.operators.graphstats import (
    label_propagation, node2vec_walks)
from climatemind_ontology_processing_spark.operators.keyphrases import (
    textrank_scores)
from climatemind_ontology_processing_spark.operators.mst import boruvka_msf
from climatemind_ontology_processing_spark.operators.pagerank import (
    katz_centrality)
from climatemind_ontology_processing_spark.operators.paths import (
    landmark_distances)
from climatemind_ontology_processing_spark.operators.rdfs import (
    transitive_closure)


@pytest.fixture(scope="module")
def graph(spark):
    # deterministic sparse digraph with a hub, a cycle, parallel weights
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)]
    edges += [(i, (i * 11 + 5) % 23) for i in range(0, 23, 2)]
    edges += [(0, 1), (1, 2), (2, 0), (5, 0)]
    rows = [(a, b, (a * 13 + b * 7) % 19 + 1) for a, b in edges if a != b]
    return spark.createDataFrame(rows, "src int, dst int, weight int")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


OPS = [
    ("boruvka", lambda g: boruvka_msf(g)),
    ("katz", lambda g: katz_centrality(g, rounds=3, atten_denom=4)),
    ("landmarks", lambda g: landmark_distances(g, num_landmarks=3)),
    ("betweenness", lambda g: sampled_betweenness(g, num_sources=3)),
    # integer sketch columns only: the float `est` convenience column may
    # differ in the last ulp between java.lang.Math.log and C libm
    ("hyperball", lambda g: hyperball(g, rounds=2, p=5)
        .select("id", "step", "n_registers", "harm_total")),
    ("node2vec", lambda g: node2vec_walks(g, length=3)),
    ("label_prop", lambda g: label_propagation(g, rounds=3)),
]


@pytest.mark.parametrize("name,op", OPS, ids=[n for n, _ in OPS])
def test_small_equals_distributed(spark, graph, monkeypatch, name, op):
    small = _rows(op(graph))
    monkeypatch.setattr(trav, "SMALL_GRAPH_THRESHOLD", 0)
    dist = _rows(op(graph))
    assert small == dist


def test_transitive_closure_small_equals_distributed(spark, monkeypatch):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x"),
         ("d", "b")], "a string, b string")
    small = _rows(transitive_closure(pairs))
    monkeypatch.setattr(trav, "SMALL_GRAPH_THRESHOLD", 0)
    dist = _rows(transitive_closure(pairs))
    assert small == dist


def test_textrank_small_equals_distributed(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * j + k) % 7}" for j in range(3)
                      for k in range(4)))
         for i in range(12)], "doc_id long, text string")
    small = _rows(textrank_scores(docs))
    monkeypatch.setattr(trav, "SMALL_GRAPH_THRESHOLD", 0)
    dist = _rows(textrank_scores(docs))
    assert small == dist


def test_annotation_rank_replicas_equal_dataframe_path(spark):
    """The driver replicas of rank_mitigations / general_myths_ranked used
    by build_graph's small path must order exactly like their DataFrame
    twins on the golden fixture (incl. truthy-CO2 nulls-last and
    frequency desc nulls-last)."""
    import json as _json
    from importlib import resources

    from climatemind_ontology_processing_spark.operators.graph_pipeline import (
        build_graph)
    from climatemind_ontology_processing_spark.operators.mitigation import (
        rank_mitigations, rank_mitigations_local)
    from climatemind_ontology_processing_spark.operators.myths import (
        general_myths_ranked, general_myths_ranked_local)
    from climatemind_ontology_processing_spark.sources.dictionary import (
        concepts_df)

    golden = _json.loads(
        (resources.files("climatemind_ontology_processing_spark.data")
         / "golden_graph.json").read_text())
    fx = spark.createDataFrame(
        [(e["src"], e["type"], e["dst"]) for e in golden["edges"]],
        "subj string, pred string, obj string")
    b = build_graph(fx, concepts_df(spark))
    mit = b.extras["mitigation_ids"]
    ups = b.extras["upstream_ids"]
    # DataFrame twins on the same inputs
    df_rank = [r.id for r in rank_mitigations(mit, b.nodes).collect()]
    assert b.mitigation_ranked == df_rank
    df_gen = [(r["myth"], r["myth_frequency"])
              for r in general_myths_ranked(b.edges, b.nodes, ups).collect()]
    got_gen = [(r["myth"], r["myth_frequency"])
               for r in b.extras["general_myths"].collect()]
    assert got_gen == df_gen
    # key-function edge cases no fixture covers: zero/None CO2 last, NaN first
    dp = {"a": {"CO2_eq_reduced": 2.0}, "b": {"CO2_eq_reduced": 0.0},
          "c": None, "d": {"CO2_eq_reduced": float("nan")},
          "e": {"CO2_eq_reduced": 5.0}}
    assert rank_mitigations_local(["a", "b", "c", "d", "e"], dp) == \
        ["d", "e", "a", "b", "c"]
    rows = [("m1", "t1", "is_a_myth_about"), ("m2", "t1", "is_a_myth_about"),
            ("m3", "t2", "other")]
    scm = {"m1": {"myth": ["x"]}, "m2": {"myth": ["x"]}, "m3": {"myth": ["x"]}}
    dp2 = {"m1": {"myth_frequency": 1.0}, "m2": None}
    assert general_myths_ranked_local(rows, scm, dp2, {"t1"}) == \
        [("m1", 1.0), ("m2", None)]
