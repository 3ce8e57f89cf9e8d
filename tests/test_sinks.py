"""EP1 sink parity: run the full pipeline on golden-derived triples and
compare the emitted artifacts against the REFERENCE's own output pickle,
loaded with networkx — the strongest end-to-end round-trip we can make.

Order-insensitive comparison for set-semantics lists (URL bags, class lists —
reference order is Python-set order); order-sensitive for the value vectors.
"""
from __future__ import annotations

import json
import os
import pickle

import pytest

from climatemind_ontology_processing_spark.plans.process_ontology import (
    process_ontology)

REFERENCE_PICKLE = ("/root/reference/ontology_processing/output/"
                    "graphs_for_visualization.pickle")

ORDERED_KEYS = {"personal_values_10", "personal_values_19", "political_value"}


def normalize(attrs: dict) -> dict:
    out = {}
    for k, v in attrs.items():
        if isinstance(v, list) and k not in ORDERED_KEYS:
            out[k] = sorted(map(str, v))
        elif isinstance(v, dict):
            out[k] = {kk: sorted(map(str, vv)) if isinstance(vv, list) else vv
                      for kk, vv in v.items()}
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def artifacts(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ep1"))
    from importlib import resources
    golden = json.loads(
        (resources.files("climatemind_ontology_processing_spark.data")
         / "golden_graph.json").read_text())
    triples = spark.createDataFrame(
        [(e["src"], e["type"], e["dst"], None, None, 1.0) for e in golden["edges"]],
        "subj string, pred string, obj string, url string, "
        "warc_ts timestamp, score double")
    process_ontology(None, out, triples=triples)
    return out


def test_artifact_files_exist(artifacts):
    for f in ["Climate_Mind_DiGraph.gpickle",
              "Climate_Mind_Digraph_Test_Ont.json",
              "graphs_for_visualization.pickle"]:
        assert os.path.exists(os.path.join(artifacts, f)), f
    assert os.path.exists(os.path.join(artifacts, "triples"))
    assert os.path.exists(os.path.join(artifacts, "nodes"))


def test_subgraph_pickle_matches_reference(artifacts):
    with open(REFERENCE_PICKLE, "rb") as f:
        ref = pickle.load(f)
    with open(os.path.join(artifacts, "graphs_for_visualization.pickle"), "rb") as f:
        got = pickle.load(f)

    assert set(got) == set(ref)
    for name, ref_g in ref.items():
        got_g = got[name]
        assert set(got_g.nodes) == set(ref_g.nodes), name
        assert set(got_g.edges) == set(ref_g.edges), name
        # attribute parity on the post-annotation subgraphs ('upstream' was
        # copied pre-annotation in the reference, so it lacks cyto_classes)
        if name == "upstream":
            continue
        for n in ref_g.nodes:
            ra = {k: v for k, v in ref_g.nodes[n].items()}
            ga = {k: v for k, v in got_g.nodes[n].items()}
            # reference data_properties spell every declared key; ours too
            assert normalize(ga) == normalize(ra), (name, n)
        for u, v in ref_g.edges:
            re_ = ref_g.edges[u, v]
            ge = got_g.edges[u, v]
            assert ge.get("type") == re_.get("type"), (name, u, v)
            assert normalize(ge.get("properties") or {}) == \
                normalize(re_.get("properties") or {}), (name, u, v)
            assert sorted(ge.get("cyto_classes", [])) == \
                sorted(re_.get("cyto_classes", [])), (name, u, v)


def test_jit_json_shape(artifacts):
    with open(os.path.join(artifacts, "Climate_Mind_Digraph_Test_Ont.json")) as f:
        data = json.load(f)
    assert isinstance(data, list) and data
    rec = data[0]
    assert set(rec) == {"id", "name", "data", "adjacencies"}


def test_gpickle_loadable_networkx(artifacts):
    import networkx as nx
    with open(os.path.join(artifacts, "Climate_Mind_DiGraph.gpickle"), "rb") as f:
        g = pickle.load(f)
    assert isinstance(g, nx.DiGraph)
    assert g.number_of_nodes() == 160 and g.number_of_edges() == 220
