"""community_stats / modularity: networkx cross-check + loud-failure pin."""
from __future__ import annotations

from fractions import Fraction

import networkx as nx
import pytest

from climatemind_ontology_processing_spark.operators.graphstats import (
    community_stats, modularity)

# two dense blobs joined by one bridge + a parallel/self-loop noise edge
EDGES = [(0, 1), (1, 2), (0, 2), (2, 3),          # blob A + bridge
         (3, 4), (4, 5), (3, 5), (5, 6), (6, 3),  # blob B
         (1, 0),                                  # reverse dup (collapses)
         (2, 2)]                                  # self-loop (dropped)
LABELS = {0: "a", 1: "a", 2: "a", 3: "b", 4: "b", 5: "b", 6: "b"}


@pytest.fixture(scope="module")
def graph_dfs(spark):
    e = spark.createDataFrame(EDGES, "src int, dst int")
    lab = spark.createDataFrame(list(LABELS.items()),
                                "id int, label string")
    return e, lab


def test_matches_networkx(spark, graph_dfs):
    e, lab = graph_dfs
    row = modularity(e, lab).collect()[0]
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in EDGES if a != b)
    parts = [{n for n, c in LABELS.items() if c == lab_}
             for lab_ in ("a", "b")]
    expected = nx.algorithms.community.modularity(g, parts)
    got = Fraction(int(row["q_num"]), int(row["q_den"]))
    assert abs(float(got) - expected) < 1e-12
    assert row["m"] == g.number_of_edges()
    assert row["n_communities"] == 2


def test_community_stats_values(spark, graph_dfs):
    e, lab = graph_dfs
    rows = {r["label"]: (r["n_nodes"], r["intra_edges"], r["degree_sum"])
            for r in community_stats(e, lab).collect()}
    # blob A: 3 nodes, triangle intra, degrees 2+2+3 (node 2 has bridge)
    assert rows["a"] == (3, 3, 7)
    # blob B: 4 nodes, 5 intra edges, node 3 carries the bridge
    assert rows["b"] == (4, 5, 11)


def test_unlabeled_node_raises(spark, graph_dfs):
    e, _ = graph_dfs
    partial = spark.createDataFrame(
        [(k, v) for k, v in LABELS.items() if k != 4], "id int, label string")
    with pytest.raises(Exception, match="unlabeled node"):
        modularity(e, partial).collect()
