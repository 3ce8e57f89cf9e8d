"""KG maintenance operators: snapshot diff and entity summarization.

A continuously-rebuilt knowledge graph (the reference regenerates its
whole NetworkX graph per ontology edit; a web-scale KG re-extracts
nightly) needs (a) a triple-level DIFF between snapshots — what changed,
and per-predicate churn to catch extraction regressions before
publishing — and (b) per-entity fact ranking for entity cards /
summaries.

Both are pure DataFrame algebra: distinct + anti-joins for the diff,
one global predicate census + a per-subject window for the ranking.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kg_diff(old: DataFrame, new: DataFrame, s: str = "subj",
            p: str = "pred", o: str = "obj") -> DataFrame:
    """Triple-level snapshot diff: (subj, pred, obj, change) with change
    in {'added', 'removed'} — set semantics (each side is DISTINCTed
    first; provenance-bearing duplicates are the dedup operators' job).

    Two keys-only anti-joins, both shuffling on the same triple key —
    AQE plans them as one exchange reuse.  Unchanged triples (the
    overwhelming bulk at web scale) are never emitted."""
    ot = old.select(s, p, o).distinct()
    nt = new.select(s, p, o).distinct()
    added = (nt.join(ot, [s, p, o], "left_anti")
             .withColumn("change", F.lit("added")))
    removed = (ot.join(nt, [s, p, o], "left_anti")
               .withColumn("change", F.lit("removed")))
    return added.unionByName(removed)


def kg_diff_stats(old: DataFrame, new: DataFrame, s: str = "subj",
                  p: str = "pred", o: str = "obj") -> DataFrame:
    """Per-predicate churn: (pred, n_added, n_removed, n_unchanged) —
    the regression dashboard for a re-extracted KG (a predicate whose
    n_removed jumps is an extractor bug).  Predicates present in either
    snapshot appear; all counts BIGINT."""
    ot = old.select(s, p, o).distinct()
    nt = new.select(s, p, o).distinct()
    tagged = (ot.withColumn("_o", F.lit(1))
              .join(nt.withColumn("_n", F.lit(1)), [s, p, o], "full")
              .select(p, F.coalesce("_o", F.lit(0)).alias("_o"),
                      F.coalesce("_n", F.lit(0)).alias("_n")))
    return (tagged.groupBy(p)
            .agg(F.sum(F.when((F.col("_n") == 1) & (F.col("_o") == 0), 1)
                       .otherwise(0)).cast("long").alias("n_added"),
                 F.sum(F.when((F.col("_o") == 1) & (F.col("_n") == 0), 1)
                       .otherwise(0)).cast("long").alias("n_removed"),
                 F.sum(F.when((F.col("_o") == 1) & (F.col("_n") == 1), 1)
                       .otherwise(0)).cast("long").alias("n_unchanged")))


def entity_fact_ranking(triples: DataFrame, top_k: int = 3,
                        s: str = "subj", p: str = "pred",
                        o: str = "obj") -> DataFrame:
    """Top-``top_k`` facts per subject, rarest-predicate-first — the
    standard IDF-flavoured entity-summarization baseline (a fact with a
    rare predicate is more identifying than one every entity carries).

    Rank order: global predicate triple-count ASC, then (pred, obj) ASC —
    fully deterministic.  The predicate census is vocabulary-sized and
    broadcast; the window partitions by subject, so skew is bounded by
    the fattest entity (cap upstream if an entity can carry millions of
    facts)."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    t = triples.select(s, p, o).distinct()
    census = t.groupBy(p).agg(F.count("*").alias("_pn"))
    w = Window.partitionBy(s).orderBy(F.col("_pn").asc(),
                                      F.col(p).asc(), F.col(o).asc())
    return (t.join(F.broadcast(census), p)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(s, F.col("rank").cast("int").alias("rank"), p, o,
                    F.col("_pn").alias("pred_count")))


def schema_summary(triples: DataFrame, s: str = "subj", p: str = "pred",
                   o: str = "obj", type_sep: str = ":") -> DataFrame:
    """Schema-graph induction (the LODStats shape): collapse the instance
    KG to one row per (subj_type, pred, obj_type) — type = the id prefix
    before ``type_sep`` (an id with no separator is its own type) — with
    triple count and distinct
    subject/object counts.  The type-level map a new consumer reads
    before writing queries, and the drift baseline ``kg_diff_stats``
    complements at the instance level.  One map-side projection + one
    aggregate; output is schema-sized."""
    ty = lambda c: F.coalesce(F.split(F.col(c), type_sep).getItem(0),
                              F.lit(""))
    t = triples.select(s, p, o).distinct()
    return (t.groupBy(ty(s).alias("subj_type"), F.col(p).alias("pred"),
                      ty(o).alias("obj_type"))
            .agg(F.count("*").alias("n_triples"),
                 F.countDistinct(s).alias("n_subj"),
                 F.countDistinct(o).alias("n_obj")))
