"""Generate a round-trip RDF/XML OWL fixture from the golden-derived fixtures.

The reference's production entry point consumes an ``.owl`` file
(``process_new_ontology_file.py:10-26``), but the repo ships no OWL source
(``ontology_processing/.gitignore`` excludes ``*.owl``) — only the output
pickle.  To test the engine's S1 OWL reader end-to-end we therefore
reconstruct an ontology that is EXACTLY consistent with the golden data:

* per-class ancestor sets are solved from concepts.json constraints —
  single-direct-class nodes pin their class's closure outright;
  ``super_class_membership`` values are each the ancestor closure of the
  LAST direct class matching that superclass (reproducing the reference's
  last-write-wins bug, make_graph_class.py:147-158, SURVEY §4.1);
  a public-taxonomy prior seeds the Schwartz personal-value structure
  (mirrors config.PERSONAL_VALUES_10 grouping); remaining classes take the
  intersection of containing-node residues;
* the class DAG is emitted as the transitive REDUCTION of those closures;
  the direct children of "climate mind" are exactly the 8 superclass keys
  observed in golden membership maps — every other top-level class hangs
  under owl:Thing (which is why it never contributes a membership key);
* individuals carry rdf:type links in direct_classes order (order is
  load-bearing for last-write-wins), labels, comments, annotation + data
  property literals, and object-property links from golden_graph.json.

The generator SELF-VALIDATES: it recomputes all_classes and the membership
maps from the reconstructed hierarchy with the reference's algorithm and
fails if anything differs from concepts.json.  Run:

    python tools/make_owl_fixture.py [out.owl]
"""
from __future__ import annotations

import ast
import json
import os
import sys
import xml.etree.ElementTree as ET
from importlib import resources

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "http://webprotege.stanford.edu"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"

CLIMATE_MIND = "climate mind"

# Schwartz refined-values taxonomy (public; mirrors config.PERSONAL_VALUES_10)
PV_MIDS = {
    "benevolence": ["benevolence caring", "benevolence dependability"],
    "conformity": ["conformity interpersonal", "conformity rules"],
    "power": ["power dominance", "power resources"],
    "security": ["security personal", "security societal"],
    "self-direction": ["self-direction autonomy of action",
                       "self-direction autonomy of thought"],
    "universalism": ["universalism concern", "universalism nature",
                     "universalism tolerance"],
}
PV_FLAT = ["achievement", "face", "hedonism", "humility", "stimulation",
           "tradition"]


def _load(name: str):
    ref = resources.files("climatemind_ontology_processing_spark.data") / name
    return json.loads(ref.read_text())


def solve_class_ancestors(rows: list[dict]) -> tuple[dict, set]:
    """Reconstruct per-class ancestor closures (class included, 'climate
    mind' excluded — matching make_graph_class.py:135-144 listified form).
    Returns (anc: label -> frozenset, golden_keys: superclass labels)."""
    golden_keys: set = set()
    for r in rows:
        golden_keys |= set((r.get("super_class_membership") or {}).keys())

    anc: dict[str, frozenset] = {}
    for mid, leaves in PV_MIDS.items():
        anc[mid] = frozenset({mid, "personal value"})
        for l in leaves:
            anc[l] = frozenset({l, mid, "personal value"})
    for l in PV_FLAT:
        anc[l] = frozenset({l, "personal value"})
    for r in rows:
        if len(r["direct_classes"]) == 1:
            anc[r["direct_classes"][0]] = frozenset(r["all_classes"])

    changed = True
    while changed:
        changed = False
        for r in rows:
            for k, v in (r.get("super_class_membership") or {}).items():
                vs = frozenset(v)
                cands = [c for c in r["direct_classes"] if c in vs]
                if len(cands) == 1 and cands[0] not in anc:
                    anc[cands[0]] = vs
                    changed = True
                    continue
                # last-matcher scan from the end of the direct order
                for ci in reversed(r["direct_classes"]):
                    if ci in anc:
                        if k in anc[ci]:
                            break
                        continue
                    if ci in vs:
                        anc[ci] = vs
                        changed = True
                    break

    all_direct = {c for r in rows for c in r["direct_classes"]}
    for c in sorted(all_direct - set(anc)):
        cand = None
        for r in rows:
            if c in r["direct_classes"]:
                known: set = set()
                for ci in r["direct_classes"]:
                    if ci in anc:
                        known |= anc[ci]
                residue = (set(r["all_classes"]) - known) | {c}
                cand = residue if cand is None else (cand & residue)
        anc[c] = frozenset(cand)
    referenced = set().union(*anc.values())
    for c in sorted(referenced - set(anc)):
        if c in golden_keys:
            anc[c] = frozenset({c})
        else:
            cand = None
            for x in list(anc):
                if c in anc[x]:
                    cand = set(anc[x]) if cand is None else (cand & anc[x])
            anc[c] = frozenset(cand)
    # transitive closing
    for _ in range(20):
        changed = False
        for c in list(anc):
            clo = set(anc[c])
            for a in anc[c]:
                clo |= anc.get(a, frozenset({a}))
            if clo != set(anc[c]):
                anc[c] = frozenset(clo)
                changed = True
        if not changed:
            break

    # SELF-VALIDATION against the reference algorithm's outputs
    errors = []
    for r in rows:
        union: set = set()
        for c in r["direct_classes"]:
            union |= anc[c]
        if union != set(r["all_classes"]):
            errors.append(("all_classes", r["label"]))
        got = {}
        for ci in r["direct_classes"]:
            for sc in golden_keys:          # direct children of climate mind
                if sc in anc[ci]:
                    got[sc] = sorted(anc[ci])   # last write wins
        want = {k: sorted(v)
                for k, v in (r.get("super_class_membership") or {}).items()}
        if got != want:
            errors.append(("membership", r["label"]))
    if errors:
        raise SystemExit(f"reconstruction failed validation: {errors[:5]}")
    return anc, golden_keys


def transitive_reduction(anc: dict) -> dict[str, list[str]]:
    """Direct parents per class: minimal elements of anc(c) \\ {c}."""
    parents = {}
    for c, s in anc.items():
        above = set(s) - {c}
        direct = [a for a in above
                  if not any(a in (anc.get(b, frozenset()) - {b})
                             for b in above if b != a)]
        parents[c] = sorted(direct)
    # verify: closure over the reduction reproduces anc
    for c in anc:
        clo, stack = {c}, list(parents[c])
        while stack:
            a = stack.pop()
            if a not in clo:
                clo.add(a)
                stack.extend(parents.get(a, []))
        if frozenset(clo) != anc[c]:
            raise SystemExit(f"reduction broke closure for {c!r}")
    return parents


def frag_of(label: str, kind: str) -> str:
    safe = "".join(ch if ch.isalnum() else "_" for ch in label)
    return f"{kind}_{safe}"


def build_owl(out_path: str) -> None:
    concepts = _load("concepts.json")
    golden = _load("golden_graph.json")
    anc, golden_keys = solve_class_ancestors(concepts)
    parents = transitive_reduction(anc)

    ET.register_namespace("rdf", RDF)
    ET.register_namespace("rdfs", RDFS)
    ET.register_namespace("owl", OWL)
    root = ET.Element(f"{{{RDF}}}RDF", {"xmlns": BASE + "#",
                                        "xml:base": BASE})
    onto = ET.SubElement(root, f"{{{OWL}}}Ontology",
                         {f"{{{RDF}}}about": BASE})
    _ = onto

    def about(frag):
        return {f"{{{RDF}}}about": f"{BASE}#{frag}"}

    def res(frag):
        return {f"{{{RDF}}}resource": f"{BASE}#{frag}"}

    def label_el(parent, text):
        el = ET.SubElement(parent, f"{{{RDFS}}}label")
        el.text = text

    # ---- classes -----------------------------------------------------
    cm = ET.SubElement(root, f"{{{OWL}}}Class", about(frag_of(CLIMATE_MIND, "C")))
    label_el(cm, CLIMATE_MIND)
    for c in sorted(anc):
        el = ET.SubElement(root, f"{{{OWL}}}Class", about(frag_of(c, "C")))
        label_el(el, c)
        ps = parents[c]
        if not ps:
            if c in golden_keys:   # only the 8 superclasses sit under climate mind
                ET.SubElement(el, f"{{{RDFS}}}subClassOf",
                              res(frag_of(CLIMATE_MIND, "C")))
            # else: implicit owl:Thing — never in any labeled closure
        for p in ps:
            ET.SubElement(el, f"{{{RDFS}}}subClassOf", res(frag_of(p, "C")))

    # ---- property declarations --------------------------------------
    edge_types = sorted({e["type"] for e in golden["edges"]})
    annot_keys = sorted({k for r in concepts for k in r["properties"]})
    data_keys = sorted({k for r in concepts for k in r["data_properties"]})
    # labels chosen so the reference aliasing maps them back to these keys
    for t in edge_types:
        el = ET.SubElement(root, f"{{{OWL}}}ObjectProperty", about(frag_of(t, "OP")))
        label_el(el, t)
    for k in annot_keys:
        el = ET.SubElement(root, f"{{{OWL}}}AnnotationProperty", about(frag_of(k, "AP")))
        label_el(el, k)
    for k in data_keys:
        el = ET.SubElement(root, f"{{{OWL}}}DatatypeProperty", about(frag_of(k, "DP")))
        label_el(el, k)

    # ---- individuals -------------------------------------------------
    onto_name = BASE.split("//", 1)[1]          # webprotege.stanford.edu
    by_label = {}
    for r in concepts:
        frag = r["iri"][len(onto_name) + 1:] if r.get("iri") else frag_of(r["label"], "I")
        by_label[r["label"]] = frag
    el_by_label = {}
    for r in concepts:
        frag = by_label[r["label"]]
        el = ET.SubElement(root, f"{{{OWL}}}NamedIndividual", about(frag))
        el_by_label[r["label"]] = el
        for c in r["direct_classes"]:           # document order == direct order
            ET.SubElement(el, f"{{{RDF}}}type", res(frag_of(c, "C")))
        label_el(el, r["label"])
        for comment in ast.literal_eval(r.get("comment") or "[]"):
            ce = ET.SubElement(el, f"{{{RDFS}}}comment")
            ce.text = comment
        for k in annot_keys:
            for v in r["properties"].get(k, []):
                pe = ET.SubElement(el, frag_of(k, "AP"))
                pe.text = v
        for k in data_keys:
            v = r["data_properties"].get(k)
            if v is None:
                continue
            dt = "integer" if isinstance(v, int) else "decimal"
            pe = ET.SubElement(el, frag_of(k, "DP"),
                               {f"{{{RDF}}}datatype": f"{XSD}{dt}"})
            pe.text = repr(v)
    # object-property links, attached to the subject individual
    for e in golden["edges"]:
        ET.SubElement(el_by_label[e["src"]], frag_of(e["type"], "OP"),
                      res(by_label[e["dst"]]))

    ET.indent(root)
    ET.ElementTree(root).write(out_path, xml_declaration=True, encoding="utf-8")
    print(f"wrote {out_path}: {len(anc)} classes, {len(concepts)} individuals, "
          f"{len(golden['edges'])} object-property links")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "climatemind_ontology_processing_spark/data/climate_mind.owl"
    build_owl(out)
