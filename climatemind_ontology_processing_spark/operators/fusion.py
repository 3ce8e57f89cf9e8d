"""Multi-source claim fusion (truth discovery) with integer-exact voting.

Not in the reference (single curated ontology = single source of truth).
A web-scale KG extractor ingests the same fact from many pages/domains
with conflicts; the standard resolution baseline is iterative source-trust
voting (TruthFinder / Latest-style majority weighted by source quality —
Yin et al. 2008, Li et al. VLDB 2014 survey).

Fixed-point shape, Spark-first: each round is two hash aggregations
(claim support = Σ trust of asserting sources; source trust = mean
confidence of its claims) and one broadcast-able per-key normalizer —
no iteration over rows, no driver state.  Rounds are a Python loop over
DataFrame transformations (the corpus shuffles ``rounds`` times on
(subj,pred) / source keys; both are natural partitionings).

All arithmetic is integer micros (floor divisions, BIGINT sums) so a
DuckDB oracle replays it bit-exactly — same convention as operators/lm.py
(CLAUDE.md "micro-BIGINT").
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _assertions(claims: DataFrame, subj: str, pred: str, obj: str,
                source: str) -> DataFrame:
    """Distinct (subj, pred, obj, source) — a source asserting the same
    claim on many pages still votes once."""
    return (claims.select(F.col(subj).alias("subj"),
                          F.col(pred).alias("pred"),
                          F.col(obj).alias("obj"),
                          F.col(source).alias("source"))
            .distinct())


def source_trust(claims: DataFrame, rounds: int = 2,
                 prior_micro: int = 500_000, subj: str = "subj",
                 pred: str = "pred", obj: str = "obj",
                 source: str = "source") -> DataFrame:
    """(source, trust_micro) after ``rounds`` of trust/confidence updates.

    round r:  conf(c)  = floor(MICRO * Σ_{s asserts c} trust(s)
                               / Σ_{s asserts any obj for (subj,pred)} trust(s))
              trust(s) = floor(Σ_{c asserted by s} conf(c) / n_claims(s))
    trust starts at ``prior_micro`` for every source.
    """
    a = _assertions(claims, subj, pred, obj, source)
    trust = (a.select("source").distinct()
             .withColumn("trust_micro",
                         F.lit(int(prior_micro)).cast("long")))
    for _ in range(int(rounds)):
        conf = _claim_conf(a, trust)
        trust = (a.join(conf, ["subj", "pred", "obj"])
                 .groupBy("source")
                 .agg(F.sum("conf_micro").cast("long").alias("_s"),
                      F.count("*").cast("long").alias("_n"))
                 .select("source",
                         F.expr("_s div _n").cast("long")
                         .alias("trust_micro")))
    return trust


def _claim_conf(a: DataFrame, trust: DataFrame) -> DataFrame:
    """(subj, pred, obj, conf_micro) given per-source trust."""
    sup = (a.join(trust, "source")
           .groupBy("subj", "pred", "obj")
           .agg(F.sum("trust_micro").cast("long").alias("support"),
                F.count("*").cast("long").alias("n_sources")))
    tot = (sup.groupBy("subj", "pred")
           .agg(F.sum("support").cast("long").alias("total")))
    return (sup.join(tot, ["subj", "pred"])
            .select("subj", "pred", "obj", "n_sources",
                    F.expr(f"(support * {MICRO}) div total").cast("long")
                    .alias("conf_micro")))


def fuse_claims(claims: DataFrame, rounds: int = 2,
                prior_micro: int = 500_000, subj: str = "subj",
                pred: str = "pred", obj: str = "obj",
                source: str = "source") -> DataFrame:
    """Resolve conflicting objects per (subj, pred): the claim with the
    highest post-round confidence wins, ties broken object-ascending.

    Output: (subj, pred, obj, conf_micro, n_sources) — one row per
    (subj, pred).  With rounds=0 this degrades to plain (unweighted)
    majority vote, which is the right smoke baseline.
    """
    a = _assertions(claims, subj, pred, obj, source)
    trust = source_trust(claims, rounds, prior_micro, subj, pred, obj,
                         source)
    conf = _claim_conf(a, trust)
    w = (Window.partitionBy("subj", "pred")
         .orderBy(F.col("conf_micro").desc(), F.col("obj").asc()))
    return (conf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("subj", "pred", "obj", "conf_micro", "n_sources"))
