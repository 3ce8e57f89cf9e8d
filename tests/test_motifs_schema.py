"""Motif matching (operators/motifs.py), WL refinement
(graphstats.wl_colors), TransE rank eval (negatives.transe_rank_eval)
and predicate schema induction (rules.pred_signatures)."""
from __future__ import annotations

import collections
import hashlib

import pytest

from climatemind_ontology_processing_spark.operators.graphstats import wl_colors
from climatemind_ontology_processing_spark.operators.motifs import (
    match_motif, parse_pattern)
from climatemind_ontology_processing_spark.operators.negatives import (
    transe_rank_eval)
from climatemind_ontology_processing_spark.operators.rules import (
    pred_signatures)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


_KG = [("c1", "buys_from", "s1"), ("c1", "in_nation", "n1"),
       ("s1", "in_nation", "n1"), ("c2", "buys_from", "s2"),
       ("c2", "in_nation", "n1"), ("s2", "in_nation", "n2"),
       ("n1", "in_region", "r1"), ("n2", "in_region", "r1")]


def test_motif_parse_rejects_malformed():
    with pytest.raises(ValueError):
        parse_pattern("(a)-[x]-(b)")  # undirected arrow unsupported
    with pytest.raises(ValueError):
        parse_pattern("   ;  ")


def test_motif_typed_triangle(spark):
    got = [tuple(r) for r in match_motif(
        _triples(spark, _KG),
        "(c)-[buys_from]->(s); (s)-[in_nation]->(n); (c)-[in_nation]->(n)"
    ).collect()]
    assert got == [("c1", "s1", "n1")]  # c2/s2 cross nations


def test_motif_predicate_variable_binds_across_edges(spark):
    # same pred var on both edges => only in_nation chains... none exist
    # (nation objs are never in_nation subjects), but (x)-[?p]->(y),
    # (y)-[in_region]->(r) binds p per row.
    rows = {(r.x, r.p) for r in match_motif(
        _triples(spark, _KG), "(x)-[?p]->(y); (y)-[in_region]->(r)"
    ).collect()}
    assert rows == {("c1", "in_nation"), ("c2", "in_nation"),
                    ("s1", "in_nation"), ("s2", "in_nation")}


def test_motif_distinct_vars_toggles_homomorphism(spark):
    # 2-path (a)->(b)->(c) on a 2-cycle: homomorphism allows a == c.
    cyc = _triples(spark, [("x", "e", "y"), ("y", "e", "x")])
    pat = "(a)-[e]->(b); (b)-[e]->(c)"
    iso = match_motif(cyc, pat, distinct_vars=True).collect()
    hom = match_motif(cyc, pat, distinct_vars=False).collect()
    assert iso == [] and len(hom) == 2


def test_motif_disconnected_requires_opt_in(spark):
    t = _triples(spark, _KG)
    with pytest.raises(ValueError, match="cartesian"):
        match_motif(t, "(a)-[buys_from]->(b); (c)-[in_region]->(d)")
    n = match_motif(t, "(a)-[buys_from]->(b); (c)-[in_region]->(d)",
                    allow_cartesian=True).count()
    assert n == 4  # 2 buys_from x 2 in_region


def test_motif_reorder_equals_author_order(spark):
    t = _triples(spark, _KG)
    pat = "(c)-[in_nation]->(n); (n)-[in_region]->(r)"
    a = sorted(map(tuple, match_motif(t, pat, reorder=True).collect()))
    b = sorted(map(tuple, match_motif(t, pat, reorder=False).collect()))
    assert a == b and len(a) == 4


def _wl_replica(edges, rounds):
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color = {v: len(adj[v]) for v in adj}
    for _ in range(rounds):
        color = {v: int(hashlib.md5((
            f"{color[v]}|" +
            ",".join(str(c) for c in sorted(color[u] for u in adj[v]))
        ).encode()).hexdigest()[:15], 16) for v in adj}
    return color


def test_wl_matches_python_replica_and_separates_roles(spark):
    # two triangles, one with a pendant chain; plus an isolated edge
    E = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 8)]
    df = spark.createDataFrame(E, ["src", "dst"])
    got = {r.id: r.color for r in wl_colors(df, rounds=3).collect()}
    assert got == _wl_replica(E, 3)
    # symmetric roles collide: plain triangle corners 1,2 == corners 5,6;
    # the two augmented corners 3,4 share a color; 7,8 share a color
    assert got[1] == got[2] == got[5] == got[6]
    assert got[3] == got[4] and got[7] == got[8]
    assert len({got[1], got[3], got[7]}) == 3


def test_wl_round_zero_rejected(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        wl_colors(df, rounds=0)


def test_transe_rank_matches_replica(spark):
    T = [("a", "r1", "b"), ("b", "r1", "c"), ("c", "r2", "a"),
         ("d", "r2", "b"), ("a", "r2", "d")]
    got = {(r.subj, r.pred, r.obj): (r.rank, r.hit)
           for r in transe_rank_eval(_triples(spark, T), dim=4, modulus=97,
                                     k_hits=2).collect()}

    def h60(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    ents = sorted({x for t in T for x in (t[0], t[2])})
    emb = lambda p, i: [h60(f"{p}|{i}|{j}") % 97 for j in range(4)]
    E = {e: emb("e", e) for e in ents}
    R = {r: emb("r", r) for r in {t[1] for t in T}}
    score = lambda h, r, t: sum(
        abs(a + b - c) for a, b, c in zip(E[h], R[r], E[t]))
    for s, p, o in T:
        st = score(s, p, o)
        rank = 1 + sum(1 for c in ents
                       if score(s, p, c) < st or
                       (score(s, p, c) == st and c < o))
        assert got[(s, p, o)] == (rank, int(rank <= 2))


def test_transe_candidate_guard(spark):
    T = [(f"e{i}", "r", f"e{i+1}") for i in range(20)]
    with pytest.raises(ValueError, match="max_candidates"):
        transe_rank_eval(_triples(spark, T), max_candidates=10)


def test_distmult_rank_matches_replica(spark):
    from climatemind_ontology_processing_spark.operators.negatives import (
        distmult_rank_eval)
    T = [("a", "r1", "b"), ("b", "r1", "c"), ("c", "r2", "a"),
         ("d", "r2", "b"), ("a", "r2", "d")]
    got = {(r.subj, r.pred, r.obj): (r.rank, r.hit)
           for r in distmult_rank_eval(_triples(spark, T), dim=4, modulus=97,
                                       k_hits=2).collect()}

    def h60(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    ents = sorted({x for t in T for x in (t[0], t[2])})
    emb = lambda p, i: [h60(f"{p}|{i}|{j}") % 97 for j in range(4)]
    E = {e: emb("e", e) for e in ents}
    R = {r: emb("r", r) for r in {t[1] for t in T}}
    score = lambda h, r, t: sum(
        a * b * c for a, b, c in zip(E[h], R[r], E[t]))
    for s, p, o in T:
        st = score(s, p, o)
        rank = 1 + sum(1 for c in ents
                       if score(s, p, c) > st or
                       (score(s, p, c) == st and c < o))
        assert got[(s, p, o)] == (rank, int(rank <= 2))


def test_distmult_overflow_guard(spark):
    from climatemind_ontology_processing_spark.operators.negatives import (
        distmult_rank_eval)
    T = [("a", "r", "b")]
    with pytest.raises(ValueError, match="overflows"):
        distmult_rank_eval(_triples(spark, T), dim=8, modulus=2 ** 21)


def test_pred_signatures_counts_and_modal_types(spark):
    T = [("c:1", "in_nation", "n:1"), ("c:2", "in_nation", "n:1"),
         ("c:3", "in_nation", "n:2"), ("s:1", "in_nation", "n:2"),
         ("n:1", "in_region", "r:1"), ("n:2", "in_region", "r:1"),
         ("c:1", "buys_from", "s:1"), ("c:1", "buys_from", "s:2")]
    got = {r.pred: r.asDict() for r in
           pred_signatures(_triples(spark, T)).collect()}
    assert got["in_nation"]["n_triples"] == 4
    assert got["in_nation"]["fun_micro"] == 1000000      # 4 subj / 4
    assert got["in_nation"]["inv_fun_micro"] == 500000   # 2 obj / 4
    assert got["in_nation"]["subj_type"] == "c"          # 3 c vs 1 s
    assert got["buys_from"]["fun_micro"] == 500000       # 1 subj / 2
    assert got["in_region"]["obj_type"] == "r"


def test_pred_signatures_modal_tie_breaks_ascending(spark):
    T = [("a:1", "p", "x:1"), ("b:1", "p", "y:1")]  # 1 a vs 1 b -> 'a'
    row = pred_signatures(_triples(spark, T)).collect()[0]
    assert row.subj_type == "a" and row.obj_type == "x"


def test_complex_rank_matches_replica(spark):
    from climatemind_ontology_processing_spark.operators.negatives import (
        complex_rank_eval)
    T = [("a", "r1", "b"), ("b", "r1", "c"), ("c", "r2", "a"),
         ("d", "r2", "b"), ("a", "r2", "d")]
    got = {(r.subj, r.pred, r.obj): (r.rank, r.hit)
           for r in complex_rank_eval(_triples(spark, T), dim=4, modulus=97,
                                      k_hits=2).collect()}

    def h60(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    ents = sorted({x for t in T for x in (t[0], t[2])})
    emb = lambda p, i: [h60(f"{p}|{i}|{j}") % 97 for j in range(4)]
    Er = {e: emb("er", e) for e in ents}
    Ei = {e: emb("ei", e) for e in ents}
    Rr = {r: emb("rr", r) for r in {t[1] for t in T}}
    Ri = {r: emb("ri", r) for r in {t[1] for t in T}}
    score = lambda h, r, t: sum(
        rr * (hr * tr + hi * ti) + ri * (hr * ti - hi * tr)
        for hr, hi, rr, ri, tr, ti in zip(Er[h], Ei[h], Rr[r], Ri[r],
                                          Er[t], Ei[t]))
    for s, p, o in T:
        st = score(s, p, o)
        rank = 1 + sum(1 for c in ents
                       if score(s, p, c) > st or
                       (score(s, p, c) == st and c < o))
        assert got[(s, p, o)] == (rank, int(rank <= 2))


def test_complex_score_is_antisymmetric_capable():
    """Score-level property (pure replica, no Spark): DistMult's bilinear
    score is SYMMETRIC in (h, t) by construction; ComplEx's imaginary
    term breaks the symmetry — the capability that lets it model
    directed relations."""

    def h60(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    emb = lambda p, i: [h60(f"{p}|{i}|{j}") % 97 for j in range(4)]
    Er = {e: emb("er", e) for e in ("a", "b")}
    Ei = {e: emb("ei", e) for e in ("a", "b")}
    E = {e: emb("e", e) for e in ("a", "b")}
    Rr, Ri, R = emb("rr", "r"), emb("ri", "r"), emb("r", "r")
    dm = lambda h, t: sum(x * y * z for x, y, z in zip(E[h], R, E[t]))
    cx = lambda h, t: sum(
        rr * (hr * tr + hi * ti) + ri * (hr * ti - hi * tr)
        for hr, hi, rr, ri, tr, ti in zip(Er[h], Ei[h], Rr, Ri,
                                          Er[t], Ei[t]))
    assert dm("a", "b") == dm("b", "a")
    assert cx("a", "b") != cx("b", "a")


def test_complex_overflow_guard(spark):
    from climatemind_ontology_processing_spark.operators.negatives import (
        complex_rank_eval)
    T = [("a", "r", "b")]
    with pytest.raises(ValueError, match="overflows"):
        complex_rank_eval(_triples(spark, T), dim=8, modulus=2 ** 21)
