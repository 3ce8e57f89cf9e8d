"""Claim fusion: pure-Python integer replica + behavioral pins."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.fusion import (
    MICRO, fuse_claims, source_trust)

# 3 honest sources agree; 1 adversary contradicts everything; one fact is
# asserted only by the adversary + one honest source (the interesting case:
# round-0 majority is a 1-1 tie broken lexically, trust rounds break it
# correctly).
CLAIMS = [
    # (subj, pred, obj, source)
    ("e1", "color", "red", "good1"),
    ("e1", "color", "red", "good2"),
    ("e1", "color", "red", "good1"),   # dup assertion, must count once
    ("e1", "color", "blue", "bad"),
    ("e2", "size", "10", "good1"),
    ("e2", "size", "10", "good3"),
    ("e2", "size", "99", "bad"),
    ("e3", "shape", "zround", "good2"),   # contested 1-1; truth sorts LAST
    ("e3", "shape", "flat", "bad"),
    ("e4", "mass", "5", "good3"),          # uncontested
]


def _replica(claims, rounds, prior=500_000):
    a = sorted(set(claims))
    sources = sorted({s for *_, s in a})
    trust = {s: prior for s in sources}
    for _ in range(rounds):
        sup, tot = {}, {}
        for s_, p_, o_, src in a:
            sup[(s_, p_, o_)] = sup.get((s_, p_, o_), 0) + trust[src]
            tot[(s_, p_)] = tot.get((s_, p_), 0) + trust[src]
        conf = {c: (sup[c] * MICRO) // tot[c[:2]] for c in sup}
        new = {}
        for s_, p_, o_, src in a:
            new.setdefault(src, []).append(conf[(s_, p_, o_)])
        trust = {src: sum(v) // len(v) for src, v in new.items()}
    sup, tot, nsrc = {}, {}, {}
    for s_, p_, o_, src in a:
        sup[(s_, p_, o_)] = sup.get((s_, p_, o_), 0) + trust[src]
        nsrc[(s_, p_, o_)] = nsrc.get((s_, p_, o_), 0) + 1
        tot[(s_, p_)] = tot.get((s_, p_), 0) + trust[src]
    conf = {c: (sup[c] * MICRO) // tot[c[:2]] for c in sup}
    fused = {}
    for (s_, p_, o_), c in conf.items():
        cur = fused.get((s_, p_))
        cand = (-c, o_)
        if cur is None or cand < cur:
            fused[(s_, p_)] = cand
    return trust, {(s_, p_, o_): (conf[(s_, p_, o_)], nsrc[(s_, p_, o_)])
                   for (s_, p_), (negc, o_) in fused.items()}


@pytest.fixture(scope="module")
def claims_df(spark):
    return spark.createDataFrame(
        CLAIMS, "subj string, pred string, obj string, source string")


@pytest.mark.parametrize("rounds", [0, 1, 2, 3])
def test_matches_integer_replica(spark, claims_df, rounds):
    exp_trust, exp_fused = _replica(CLAIMS, rounds)
    got_trust = {r["source"]: r["trust_micro"]
                 for r in source_trust(claims_df, rounds=rounds).collect()}
    assert got_trust == exp_trust
    got = {(r["subj"], r["pred"], r["obj"]): (r["conf_micro"],
                                              r["n_sources"])
           for r in fuse_claims(claims_df, rounds=rounds).collect()}
    assert got == exp_fused


def test_trust_rounds_break_ties_toward_honest_sources(spark, claims_df):
    # rounds=0: e3 is a 1-1 tie, lexical tiebreak picks the WRONG 'flat'.
    r0 = {(r["subj"], r["obj"]) for r in
          fuse_claims(claims_df, rounds=0).collect()}
    assert ("e3", "flat") in r0
    # rounds>=1: the adversary's trust collapses (it loses e1/e2 votes),
    # so the honest source's 'zround' wins despite sorting last.
    r2 = {(r["subj"], r["obj"]) for r in
          fuse_claims(claims_df, rounds=2).collect()}
    assert {("e1", "red"), ("e2", "10"), ("e3", "zround"),
            ("e4", "5")} <= r2
    trust = {r["source"]: r["trust_micro"]
             for r in source_trust(claims_df, rounds=2).collect()}
    assert trust["bad"] < min(trust["good1"], trust["good2"],
                              trust["good3"])
