"""RDFS entailment closure: per-rule pins, brute-force fixpoint replica,
idempotence, and the loud round-cap."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.rdfs import (
    rdfs_closure, rdfs_increment, transitive_closure)

SCHEMA = [
    ("A", "subClassOf", "B"), ("B", "subClassOf", "C"),
    ("p", "subPropertyOf", "q"), ("q", "subPropertyOf", "r"),
    ("q", "domain", "B"), ("p", "range", "A"),
]
INSTANCE = [("x", "p", "y"), ("z", "type", "A"), ("x", "r", "w")]


def _replica(instance, schema):
    """Naive fixpoint over rdfs2/3/5/7/9/11 — the spec, not the plan."""
    facts = set(instance) | set(schema)
    changed = True
    while changed:
        changed = False
        new = set()
        sc = {(s, o) for s, p, o in facts if p == "subClassOf"}
        sp = {(s, o) for s, p, o in facts if p == "subPropertyOf"}
        for a, b in sc:
            for c, d in sc:
                if b == c:
                    new.add((a, "subClassOf", d))          # rdfs11
        for a, b in sp:
            for c, d in sp:
                if b == c:
                    new.add((a, "subPropertyOf", d))        # rdfs5
        for s, p, o in list(facts):
            if p in ("subClassOf", "subPropertyOf", "domain", "range"):
                continue
            for pp, q in sp:
                if pp == p:
                    new.add((s, q, o))                      # rdfs7
            for dp, c in {(x, y) for x, pr, y in facts if pr == "domain"}:
                if dp == p and p != "type":
                    new.add((s, "type", c))                 # rdfs2
            for rp, c in {(x, y) for x, pr, y in facts if pr == "range"}:
                if rp == p and p != "type":
                    new.add((o, "type", c))                 # rdfs3
            if p == "type":
                for c, d in sc:
                    if c == o:
                        new.add((s, "type", d))             # rdfs9
        if not new <= facts:
            facts |= new
            changed = True
    return facts


@pytest.fixture(scope="module")
def closed(spark):
    inst = spark.createDataFrame(INSTANCE, "subj string, pred string, obj string")
    sch = spark.createDataFrame(SCHEMA, "subj string, pred string, obj string")
    rows = rdfs_closure(inst, sch).collect()
    return {(r.subj, r.pred, r.obj): r.derived for r in rows}


def test_transitive_closure_chain_and_cycle(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 5)], "a int, b int")
    got = {(r.a, r.b) for r in transitive_closure(pairs).collect()}
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                   (5, 6), (6, 5), (5, 5), (6, 6)}


def test_transitive_closure_round_cap_raises(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a int, b int")
    with pytest.raises(RuntimeError, match="max_rounds"):
        transitive_closure(chain, max_rounds=2)


def test_matches_bruteforce_fixpoint(closed):
    assert set(closed) == _replica(INSTANCE, SCHEMA)


def test_per_rule_entailments(closed):
    # rdfs11 / rdfs5 transitivity
    assert closed[("A", "subClassOf", "C")] == 1
    assert closed[("p", "subPropertyOf", "r")] == 1
    # rdfs7 property propagation ((x r y) via p<q<r; (x q y) one hop)
    assert closed[("x", "q", "y")] == 1
    assert closed[("x", "r", "y")] == 1
    # rdfs2 via the SUPERproperty's domain (q domain B fires for p-assertion)
    assert closed[("x", "type", "B")] == 1
    # rdfs3 direct range
    assert closed[("y", "type", "A")] == 1
    # rdfs9 through the closed hierarchy
    assert closed[("y", "type", "C")] == 1
    assert closed[("z", "type", "C")] == 1
    # asserted rows flagged 0 (instance AND schema)
    assert closed[("x", "p", "y")] == 0
    assert closed[("z", "type", "A")] == 0
    assert closed[("A", "subClassOf", "B")] == 0
    # (x r y) is entailed AND asserted -> asserted wins
    assert closed[("x", "r", "w")] == 0


def test_increment_equals_full_run(spark):
    sch = spark.createDataFrame(SCHEMA, "subj string, pred string, obj string")
    base = spark.createDataFrame(INSTANCE,
                                 "subj string, pred string, obj string")
    # delta asserts a row the base run only DERIVED (derived must flip to
    # 0), plus genuinely new facts that entail through every rule family
    delta_rows = [("x", "q", "y"), ("u", "p", "v"), ("v", "type", "A")]
    delta = spark.createDataFrame(delta_rows,
                                  "subj string, pred string, obj string")
    inc = rdfs_increment(rdfs_closure(base, sch), delta, sch)
    full = rdfs_closure(base.unionByName(delta), sch)
    as_map = lambda df: {(r.subj, r.pred, r.obj): r.derived
                         for r in df.collect()}
    gi, gf = as_map(inc), as_map(full)
    assert gi == gf
    assert gi[("x", "q", "y")] == 0          # was derived, now asserted
    assert gi[("u", "type", "C")] == 1        # new fact entails rdfs2+9


def test_literal_path_equals_join_path(spark, monkeypatch):
    """The literal small path (schema closed driver-side, rule joins as
    literal-map explodes) must row-equal the broadcast-join path on a
    schema exercising every rule family, incl. a superproperty domain."""
    from climatemind_ontology_processing_spark.operators import rdfs as mod
    inst = spark.createDataFrame(
        INSTANCE + [("y", "q", "z"), ("w", "type", "B")],
        "subj string, pred string, obj string")
    sch = spark.createDataFrame(SCHEMA, "subj string, pred string, obj string")
    as_map = lambda df: {(r.subj, r.pred, r.obj): r.derived
                         for r in df.collect()}
    lit_out = as_map(rdfs_closure(inst, sch))          # literal path (tiny)
    monkeypatch.setattr(mod, "SCHEMA_LITERAL_MAX", 0)  # force join path
    join_out = as_map(rdfs_closure(inst, sch))
    assert lit_out == join_out


def test_idempotent(spark, closed):
    once = spark.createDataFrame(
        [(s, p, o) for (s, p, o) in closed],
        "subj string, pred string, obj string")
    sch = spark.createDataFrame(SCHEMA, "subj string, pred string, obj string")
    again = {(r.subj, r.pred, r.obj)
             for r in rdfs_closure(once, sch).collect()}
    assert again == set(closed)
