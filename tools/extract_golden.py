"""Derive JSON fixtures from the reference's golden output pickle.

The reference repo ships exactly one machine-checkable artifact:
``ontology_processing/output/graphs_for_visualization.pickle`` (written by
``process_visualization.py:22-33``).  It holds 25 named NetworkX subgraphs of the
annotated acyclic graph ``B`` (myth nodes removed, see ``make_graph_class.py:381-393``).

This script converts that pickle into two plain-JSON fixtures checked into
``climatemind_ontology_processing_spark/data/``:

* ``concepts.json`` — the broadcast concept dictionary (one row per node; schema
  mirrors ``make_graph_class.py:113-170``).  Node ``properties`` in the pickle are
  *post* edge-property removal (``make_graph_class.py:357-376``); the pre-removal
  bags are reconstructed exactly as ``post ∪ (union of incident edge property
  intersections)`` because ``to_remove[(node, prop)] ⊆ before`` by construction
  (``make_graph_class.py:338-350``).
* ``golden_graph.json`` — parity oracle: node attributes, edges with properties +
  cyto classes, and per-subgraph membership (node and edge lists).

Run once (output is committed):  python tools/extract_golden.py
"""
from __future__ import annotations

import json
import pickle
from pathlib import Path

PICKLE = "/root/reference/ontology_processing/output/graphs_for_visualization.pickle"
OUT = Path(__file__).resolve().parent.parent / "climatemind_ontology_processing_spark" / "data"

# the annotated graph is the union-of-subgraphs base; downstream_adaptations ∪
# upstream_mitigations covers it (every other pickled subgraph is a subset)
BASE_KEYS = ["downstream_adaptations", "upstream_mitigations", "upstream", "downstream"]


def main() -> None:
    with open(PICKLE, "rb") as f:
        graphs = pickle.load(f)

    # ---- union base graph ----------------------------------------------------
    # ONLY the 4 named subgraphs: the per-personal-value subgraphs are cut from
    # the solutions-REVERSED graph (process_visualization.py:120-127), so their
    # edge lists contain flipped copies that must not leak into the base edge set
    nodes: dict[str, dict] = {}
    edges: dict[tuple[str, str], dict] = {}
    for key in BASE_KEYS:
        sg = graphs[key]
        for n, attrs in sg.nodes(data=True):
            if n not in nodes:
                nodes[n] = attrs
        for u, v, attrs in sg.edges(data=True):
            if (u, v) not in edges:
                edges[(u, v)] = attrs

    # ---- concepts.json -------------------------------------------------------
    concepts = []
    for label, a in sorted(nodes.items()):
        post_props = {k: list(v) for k, v in a.get("properties", {}).items()}
        # reconstruct pre-removal property bags (see module docstring)
        pre_props = {k: list(v) for k, v in post_props.items()}
        for (u, v), ea in edges.items():
            if label not in (u, v):
                continue
            for prop, urls in (ea.get("properties") or {}).items():
                if prop not in pre_props:
                    pre_props[prop] = []
                for url in urls:
                    if url not in pre_props[prop]:
                        pre_props[prop].append(url)
        for k in pre_props:
            pre_props[k] = sorted(pre_props[k])

        # data-dependent per-superclass membership keys -> one map column
        known = {
            "label", "iri", "comment", "direct classes", "all classes",
            "properties", "data_properties", "personal_values_10",
            "personal_values_19", "political_value", "cyto_classes",
        }
        super_membership = {
            k: list(v) for k, v in a.items()
            if k not in known and isinstance(v, list)
            and all(isinstance(x, str) for x in v)
        }

        concepts.append({
            "concept_id": label,
            "label": label,
            "iri": a.get("iri", ""),
            "comment": a.get("comment", ""),
            "direct_classes": list(a.get("direct classes", [])),
            "all_classes": list(a.get("all classes", [])),
            "super_class_membership": super_membership,
            "properties": pre_props,
            "data_properties": {k: v for k, v in a.get("data_properties", {}).items()},
        })

    # ---- golden_graph.json ---------------------------------------------------
    golden = {
        "nodes": {
            label: {
                "label": a.get("label"),
                "iri": a.get("iri"),
                "comment": a.get("comment"),
                "direct_classes": list(a.get("direct classes", [])),
                "all_classes": sorted(a.get("all classes", [])),
                "super_class_membership": {
                    k: sorted(v) for k, v in a.items()
                    if k not in {
                        "label", "iri", "comment", "direct classes", "all classes",
                        "properties", "data_properties", "personal_values_10",
                        "personal_values_19", "political_value", "cyto_classes",
                    } and isinstance(v, list)
                },
                "properties": {k: sorted(v) for k, v in a.get("properties", {}).items()},
                "data_properties": a.get("data_properties", {}),
                "personal_values_10": a.get("personal_values_10"),
                "personal_values_19": a.get("personal_values_19"),
                "political_value": a.get("political_value"),
                "cyto_classes": sorted(a.get("cyto_classes", [])),
            }
            for label, a in sorted(nodes.items())
        },
        "edges": [
            {
                "src": u,
                "dst": v,
                "type": a.get("type"),
                "properties": {k: sorted(vv) for k, vv in (a.get("properties") or {}).items()},
                "cyto_classes": sorted(a.get("cyto_classes", [])),
            }
            for (u, v), a in sorted(edges.items())
        ],
        "subgraphs": {
            key: {
                "nodes": sorted(sg.nodes()),
                "edges": sorted([u, v] for u, v in sg.edges()),
            }
            for key, sg in graphs.items()
        },
    }

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "concepts.json").write_text(json.dumps(concepts, indent=1, sort_keys=True))
    (OUT / "golden_graph.json").write_text(json.dumps(golden, indent=1, sort_keys=True))
    print(f"wrote {len(concepts)} concepts, {len(golden['edges'])} edges, "
          f"{len(golden['subgraphs'])} subgraphs")


if __name__ == "__main__":
    main()
