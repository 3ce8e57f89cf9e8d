"""Myth / causal-source / test-ontology passes on hand-built fixtures with
pure-Python oracles (the golden pickle contains no myth nodes — they are
removed before pickling, make_graph_class.py:381-393 — so these passes need
their own fixtures)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.config import (
    CAUSES, INHIBITS, MYTH_ABOUT)
from climatemind_ontology_processing_spark.operators.causal_sources import causal_sources
from climatemind_ontology_processing_spark.operators.myths import (
    general_myths_ranked, myth_nodes, myth_sources, solution_and_impact_myths)
from climatemind_ontology_processing_spark.operators.test_ontology import (
    filter_test_ontology)

NODE_SCHEMA = ("label string, super_class_membership map<string,array<string>>, "
               "properties map<string,array<string>>, data_properties map<string,double>, "
               "direct_classes array<string>")


@pytest.fixture(scope="module")
def fixture(spark):
    nodes = spark.createDataFrame([
        ("myth1", {"myth": ["myth"]},
         {"dc_source": ["http://m1.example.com/a"],
          "schema_mediaSource": ["http://m1.example.com/a", "http://m1.example.com/b"]},
         {"myth_frequency": 7.0}, ["myth"]),
        ("myth2", {"myth": ["myth"]}, {}, {"myth_frequency": 9.0}, ["myth"]),
        ("myth3", {"myth": ["myth"]}, {}, {}, ["myth"]),
        ("solution_node", {"risk solution": ["risk solution"]}, {}, {}, ["risk solution"]),
        ("downstream_node", {}, {}, {}, ["risk"]),
        ("upstream_node", {}, {}, {}, ["test ontology"]),
        ("other", {}, {}, {}, ["risk"]),
    ], NODE_SCHEMA)
    edges = spark.createDataFrame([
        ("myth1", "solution_node", MYTH_ABOUT, {}),
        ("myth1", "downstream_node", MYTH_ABOUT, {}),
        ("myth2", "upstream_node", MYTH_ABOUT, {}),
        ("myth3", "upstream_node", MYTH_ABOUT, {}),
        ("myth2", "downstream_node", MYTH_ABOUT, {}),
        # non-myth edge types must be ignored even from myth nodes
        ("myth1", "upstream_node", CAUSES, {}),
        ("other", "solution_node", MYTH_ABOUT, {}),  # src not a myth node
    ], "src string, dst string, type string, properties map<string,array<string>>")
    down = spark.createDataFrame([("downstream_node",)], "id string")
    ups = spark.createDataFrame([("upstream_node",)], "id string")
    return nodes, edges, down, ups


def test_myth_nodes(spark, fixture):
    nodes, *_ = fixture
    assert {r.label for r in myth_nodes(nodes).collect()} == {"myth1", "myth2", "myth3"}


def test_solution_and_impact_myths(spark, fixture):
    nodes, edges, down, _ = fixture
    got = {r.target: (r.solution_myths, r.impact_myths)
           for r in solution_and_impact_myths(edges, nodes, down).collect()}
    assert got == {
        "solution_node": (["myth1"], []),
        "downstream_node": ([], ["myth1", "myth2"]),
    }


def test_general_myths_ranked(spark, fixture):
    nodes, edges, _, ups = fixture
    got = [(r.myth, r.myth_frequency) for r in
           general_myths_ranked(edges, nodes, ups).collect()]
    # myth2 freq 9 first; myth3 has no frequency -> nulls last
    assert got == [("myth2", 9.0), ("myth3", None)]


def test_myth_sources(spark, fixture):
    nodes, *_ = fixture
    got = {r.myth: r.myth_sources for r in myth_sources(nodes).collect()}
    # dc_source first, then schema_mediaSource extras, first-occurrence dedup
    assert got["myth1"] == ["http://m1.example.com/a", "http://m1.example.com/b"]
    assert got["myth2"] == []


def test_causal_sources(spark):
    edges = spark.createDataFrame([
        ("a", "t", CAUSES, {"dc_source": ["http://x.example.com/1", "bad-url"]}),
        ("b", "t", CAUSES, {"schema_governmentSource": ["http://y.example.com/2",
                                                        "http://x.example.com/1"]}),
        ("c", "t", INHIBITS, {"dc_source": ["http://z.example.com/3"]}),  # wrong type
        ("d", "t2", CAUSES, {}),        # empty bag -> target gets no attribute
        ("e", "t3", CAUSES, {"schema_longDescription": ["http://not-source-type.example.com/x"]}),
    ], "src string, dst string, type string, properties map<string,array<string>>")
    got = {r.label: r.causal_sources for r in causal_sources(edges).collect()}
    assert got["t"] == ["http://x.example.com/1", "http://y.example.com/2"]
    assert "t2" not in got          # if-causal_sources gate (process_causal_sources.py:28)
    assert got["t3"] == []          # qualifying edge but no source-type urls


def test_filter_test_ontology(spark):
    nodes = spark.createDataFrame([
        ("keep1", ["test ontology"]),
        ("keep2", ["achievement", "risk"]),          # allow hit, no deny
        ("drop_deny", ["test ontology", "risk solution"]),  # deny wins
        ("drop_noallow", ["risk"]),
    ], "label string, direct_classes array<string>")
    edges = spark.createDataFrame([
        ("keep1", "keep2", CAUSES), ("keep1", "drop_deny", CAUSES),
        ("drop_noallow", "keep2", CAUSES),
    ], "src string, dst string, type string")
    kept, kept_edges = filter_test_ontology(nodes, edges)
    assert {r.label for r in kept.collect()} == {"keep1", "keep2"}
    assert {(r.src, r.dst) for r in kept_edges.collect()} == {("keep1", "keep2")}
