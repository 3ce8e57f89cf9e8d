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
