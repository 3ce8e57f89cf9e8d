"""AMIE-style chain rule mining (operators/rules.py)."""
from __future__ import annotations

from climatemind_ontology_processing_spark.operators.rules import (
    apply_chain_rules, chain_body_pairs, mine_chain_rules)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _family(spark):
    """5 children x parent x grandparent, plus the grandparent_of ground
    truth for 4 of the 5 (one missing -> conf 4/5)."""
    rows = []
    for i in range(5):
        rows += [(f"kid{i}", "child_of", f"par{i}"),
                 (f"par{i}", "child_of", f"gp{i}")]
    for i in range(4):
        rows += [(f"kid{i}", "grandchild_of", f"gp{i}")]
    return _triples(spark, rows)


def test_planted_rule_support_and_confidence(spark):
    got = {(r.p, r.q, r.head): (r.support, r.n_body, r.conf_micro)
           for r in mine_chain_rules(_family(spark), min_support=2,
                                     max_fanout=None).collect()}
    # child_of o child_of => grandchild_of: 4 of 5 chains have the head
    assert got[("child_of", "child_of", "grandchild_of")] == (4, 5, 800000)


def test_min_support_filters(spark):
    rules = mine_chain_rules(_family(spark), min_support=5,
                             max_fanout=None).collect()
    assert rules == []  # max support present is 4


def test_multiple_z_witnesses_count_once(spark):
    # two distinct z-paths between the same (x, y) — body pair counts ONCE
    t = _triples(spark, [
        ("a", "p", "z1"), ("a", "p", "z2"),
        ("z1", "q", "b"), ("z2", "q", "b"),
        ("a", "r", "b"),
    ])
    rules = {(r.p, r.q, r.head): (r.support, r.n_body)
             for r in mine_chain_rules(t, min_support=1,
                                       max_fanout=None).collect()}
    assert rules[("p", "q", "r")] == (1, 1)


def test_max_fanout_drops_hub_loudly(spark):
    # hub z: 3 in-edges x 3 out-edges = 9 body pairs > cap 4
    rows = ([(f"x{i}", "p", "hub") for i in range(3)]
            + [("hub", "q", f"y{j}") for j in range(3)]
            + [("a", "p", "w"), ("w", "q", "b")])
    t = _triples(spark, rows)
    body_all, audit_all = chain_body_pairs(t, max_fanout=None)
    assert audit_all.count() == 0 and body_all.count() == 10
    body, audit = chain_body_pairs(t, max_fanout=4)
    hubs = audit.collect()
    assert [(h.z, h.n_in, h.n_out) for h in hubs] == [("hub", 3, 3)]
    # only the w-chain survives — hub chains dropped on BOTH sides
    assert {(r.x, r.y) for r in body.collect()} == {("a", "b")}


def test_apply_rules_emits_only_new_edges(spark):
    t = _family(spark)
    rules = mine_chain_rules(t, min_support=2, max_fanout=None)
    new = apply_chain_rules(t, rules, min_conf_micro=800000).collect()
    # the one missing grandchild_of edge is predicted; the 4 existing are not
    assert {(r.subj, r.pred, r.obj) for r in new} \
        == {("kid4", "grandchild_of", "gp4")}
    assert new[0].conf_micro == 800000
